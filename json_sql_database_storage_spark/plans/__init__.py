from .inspect import (explain_formatted, pushed_filters, read_schema_columns,
                      uses_broadcast_hash_join, wholestage_codegen_spans)

__all__ = ["explain_formatted", "pushed_filters", "read_schema_columns",
           "uses_broadcast_hash_join", "wholestage_codegen_spans"]
