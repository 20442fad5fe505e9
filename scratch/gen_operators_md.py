import sys
sys.path.insert(0, "/root/repo")
from sas_etl_spark.registry import QUERIES, queries_map
queries_map()
lines = [
    "# OPERATORS — registry cross-reference",
    "",
    "Generated from `sas_etl_spark.registry` (scratch/gen_operators_md.py).",
    "Verification: **oracle** = hash-compared against DuckDB SQL at sf0.01 by",
    "the driver AND tests/test_oracle_parity.py; **rows-only** = driver",
    "records rowcount/schema, semantics pinned by unit tests.",
    "",
    "| query | verification | tags | what it proves |",
    "| --- | --- | --- | --- |",
]
for name, spec in sorted(QUERIES.items()):
    first = (spec.doc or "").split("\n")[0].strip().rstrip(".")
    ver = "oracle" if spec.oracle else "rows-only"
    lines.append(f"| `{name}` | {ver} | {', '.join(spec.tags)} | {first} |")
lines += [
    "",
    f"Totals: {sum(1 for s in QUERIES.values() if s.oracle)} oracle-paired, "
    f"{sum(1 for s in QUERIES.values() if not s.oracle)} rows-only.",
    "",
]
open("/root/repo/OPERATORS.md", "w").write("\n".join(lines))
print("wrote", len(QUERIES), "entries")
