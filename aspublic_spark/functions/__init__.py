from aspublic_spark.functions.tokenizer import tokenize, tokens_udf  # noqa: F401
from aspublic_spark.functions.html import html_text_udf, html_to_text  # noqa: F401,E402
from aspublic_spark.functions.json_hooks import normalize_status_json  # noqa: F401,E402
from aspublic_spark.functions.stemmer import (  # noqa: F401,E402
    get_analyzer,
    porter_stem,
    tokenize_english,
)
