from dgraph_dbpedia_spark.operators.topk import top_k_per_group, filter_to_top_k
from dgraph_dbpedia_spark.operators.majority import majority_value_per_group, filter_to_majority

__all__ = [
    "top_k_per_group",
    "filter_to_top_k",
    "majority_value_per_group",
    "filter_to_majority",
]
