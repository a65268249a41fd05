from json_schema_py_spark.cli import main

raise SystemExit(main())
