from radarpipeline_spark.cli import main

raise SystemExit(main())
