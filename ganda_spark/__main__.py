from ganda_spark.cli import main

raise SystemExit(main())
