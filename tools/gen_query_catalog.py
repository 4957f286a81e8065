"""Regenerate QUERIES.md: one row per driver-contract query with its
docstring summary and oracle status."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as m  # noqa: E402


def main():
    rows = []
    for name, fn in m.queries().items():
        doc = (fn.__doc__ or "").strip().split("\n\n")[0]
        doc = " ".join(x.strip() for x in doc.split("\n")).replace("|", "\\|")
        oracle = "closed-form SQL" if name in m.oracle_sql() else "rows-only"
        rows.append((name, doc, oracle))
    out = [
        "# Driver-contract query catalog",
        "",
        "Every operator the engine claims is exposed as a `queries()` entry in",
        "`__spark_entry__.py`; all of them carry a DuckDB `oracle_sql()` twin, so the",
        "driver's correctness gate value-hash-checks each one at sf0.01.",
        "Regenerate with: `python tools/gen_query_catalog.py`.",
        "",
        f"{len(rows)} queries, "
        f"{sum(1 for r in rows if r[2] == 'closed-form SQL')} oracle-checked:",
        "",
        "| query | what it verifies | oracle |",
        "|---|---|---|",
    ]
    out += [f"| `{n}` | {d} | {o} |" for n, d, o in rows]
    (REPO / "QUERIES.md").write_text("\n".join(out) + "\n")
    print(f"QUERIES.md: {len(rows)} entries")


if __name__ == "__main__":
    main()
