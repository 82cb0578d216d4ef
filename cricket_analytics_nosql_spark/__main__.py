from cricket_analytics_nosql_spark.cli import main

raise SystemExit(main())
