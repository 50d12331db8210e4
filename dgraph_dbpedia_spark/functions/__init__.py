from dgraph_dbpedia_spark.functions.rdf import (
    extract_datatype,
    coerce_datatype,
    blank_node,
    remove_lang_tags,
    node_lang,
    geo_to_geojson,
    rdf_line,
    strip_angle_brackets,
    remap_en_lang,
)

__all__ = [
    "extract_datatype",
    "coerce_datatype",
    "blank_node",
    "remove_lang_tags",
    "node_lang",
    "geo_to_geojson",
    "rdf_line",
    "strip_angle_brackets",
    "remap_en_lang",
]
