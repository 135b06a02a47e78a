"""Column-expression helpers.

Every helper comes in two flavors sharing one definition site:
``*_col`` returns a PySpark ``Column`` (JVM-side, codegen-friendly —
no Python UDFs in any hot path) and ``*_sql`` returns the equivalent
ANSI/DuckDB SQL string so the driver's oracle can verify the exact
same semantics.
"""
