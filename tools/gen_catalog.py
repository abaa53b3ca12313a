"""Generate CATALOG.md from the query registry.

One row per registered operator: name, one-line contract (first line of
the implementation docstring), implementation site, oracle status.
Discoverability is the adoption bottleneck at 477 registered names — this
is the generated index a user scans before reading code.

Run:  python tools/gen_catalog.py          # rewrites CATALOG.md
Drift gate: tests/test_catalog.py fails when CATALOG.md is stale or a
registration lacks a docstring.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _rows():
    from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    # detect aliases: names sharing a callable keep the first-registered
    # name as canonical
    canonical: dict[int, str] = {}
    rows = []
    for name, fn in qs.items():
        key = id(fn)
        alias_of = canonical.get(key)
        if alias_of is None:
            canonical[key] = name
        doc = (fn.__doc__ or "").strip()
        first = doc.splitlines()[0].rstrip() if doc else ""
        path = os.path.relpath(fn.__code__.co_filename, _REPO)
        line = fn.__code__.co_firstlineno
        oracle = "full oracle" if name in os_ else "rows-only"
        rows.append((name, first, f"{path}:{line}", oracle, alias_of))
    return rows


def render() -> str:
    rows = _rows()
    n_oracle = sum(1 for r in rows if r[3] == "full oracle")
    out = [
        "# Operator catalog",
        "",
        "GENERATED — do not edit; run `python tools/gen_catalog.py`.",
        f"{len(rows)} registered operators, {n_oracle} with full DuckDB",
        "oracles (rows+schema+value-hash gate), the rest rows-only by design",
        "(non-SQL-expressible: RNG, codecs, HTTP side effects, eigen/model",
        "internals) with property/differential twins in tests/.",
        "",
        "| operator | contract | impl | oracle |",
        "|---|---|---|---|",
    ]
    for name, first, site, oracle, alias_of in sorted(rows):
        contract = f"alias of `{alias_of}` — {first}" if alias_of else first
        contract = contract.replace("|", "\\|")
        out.append(f"| `{name}` | {contract} | {site} | {oracle} |")
    out.append("")
    return "\n".join(out)


def main() -> None:
    target = os.path.join(_REPO, "CATALOG.md")
    with open(target, "w") as fh:
        fh.write(render())
    print(f"wrote {target}")


if __name__ == "__main__":
    main()
