from aspublic_spark.functions.tokenizer import tokenize, tokens_udf  # noqa: F401
