"""Pure-Python extraction kernel (no Spark imports).

Designed to be called from inside Arrow-batched pandas UDFs: module-level
functions over ``bytes``/``str``. Semantics are byte-identical to the
reference Go library's test fixtures (see docstrings for file:line cites).
"""

from jsonextract_spark.kernel.scanner import extract_objects, extract_objects_str
from jsonextract_spark.kernel.objects import ObjectOption, match_objects, ERR_STOP

__all__ = [
    "extract_objects",
    "extract_objects_str",
    "ObjectOption",
    "match_objects",
    "ERR_STOP",
]
