"""CATALOG.md drift gate: the generated operator index must match the
registry, and every registration must carry a docstring (the catalog's
one-line contract column comes from it — an undocumented operator is
invisible to users)."""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_registration_has_docstring():
    from sdg_data_catalog_spark.queries.registry import all_queries

    missing = sorted(
        name
        for name, fn in all_queries().items()
        if not (fn.__doc__ or "").strip()
    )
    assert missing == [], f"registrations without docstrings: {missing}"


def test_catalog_md_is_current():
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    import gen_catalog

    with open(os.path.join(_REPO, "CATALOG.md")) as fh:
        on_disk = fh.read()
    assert on_disk == gen_catalog.render(), (
        "CATALOG.md is stale — run `python tools/gen_catalog.py`"
    )
