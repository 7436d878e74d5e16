from aspublic_spark.query.parser import ParsedQuery, parse_query, parse_websearch  # noqa: F401
from aspublic_spark.query.engine import SearchEngine  # noqa: F401
