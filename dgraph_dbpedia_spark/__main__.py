from dgraph_dbpedia_spark.cli import main

raise SystemExit(main())
