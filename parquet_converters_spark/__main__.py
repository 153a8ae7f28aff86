import sys

from parquet_converters_spark.cli import main

sys.exit(main())
