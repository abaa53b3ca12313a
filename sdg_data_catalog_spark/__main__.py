from sdg_data_catalog_spark.cli import main

main()
