from aspublic_spark.index.build import IndexBuilder, build_index  # noqa: F401
