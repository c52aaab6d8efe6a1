from clickhouse_k_means_spark.cli import main

raise SystemExit(main())
