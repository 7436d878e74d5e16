from aspublic_spark.query.parser import (  # noqa: F401
    ParsedQuery,
    parse_fts5,
    parse_query,
    parse_websearch,
)
from aspublic_spark.query.engine import SearchEngine  # noqa: F401
