"""Regenerate QUERIES.md from __spark_entry__'s registry: one line
per queries() entry (docstring, whitespace-collapsed), *(rows-only)*
marking entries without an oracle_sql() mirror.

Usage: python scripts/gen_queries_md.py  (from the repo root)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    lines = []
    for name in sorted(qs):
        doc = " ".join((qs[name].__doc__ or "").split()) or "(no docstring)"
        tag = "" if name in oracles else " *(rows-only)*"
        lines.append(f"- `{name}`{tag} — {doc}")
    n, m = len(qs), len(set(qs) & set(oracles))
    header = (
        "# QUERIES — driver-checked query index\n\n"
        f"{n} queries registered in `__spark_entry__.queries()`; {m} carry "
        "DuckDB value-hash oracles"
        + (
            " (the rest are rows-only checks)"
            if m < n
            else " — every registered query is value-hash-checked"
        )
        + ". Each line: name — what it computes "
        "(from the wrapper docstring); *(rows-only)* marks entries without "
        "a SQL oracle.\n\n"
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write(header + "\n".join(lines) + "\n")
    print(f"{n} queries, {m} with oracles -> {out}")


if __name__ == "__main__":
    main()
