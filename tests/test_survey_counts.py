"""SURVEY.md §2.0 count-drift gate (VERDICT r12 item 6): the §2.0
header's "N registered queries", "N with full DuckDB oracles" and "N
rows-only" claims are the contract the driver and judge check against,
and they drifted twice (r12 found 216/35 against a live 220/34 that
didn't even sum).  Parse the three numbers out of the prose and compare
them to the live registry so the doc cannot drift again."""

from __future__ import annotations

import re
from pathlib import Path

from etl_wildweb_spark import registry

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _survey_counts() -> tuple[int, int, int]:
    text = SURVEY.read_text()
    sec = text[text.index("§2.0") :]
    registered = int(re.search(r"(\d+) registered queries", sec).group(1))
    oracled = int(re.search(r"(\d+) with full DuckDB oracles", sec).group(1))
    rows_only = int(re.search(r"(\d+)\s*\nrows-only", sec).group(1))
    return registered, oracled, rows_only


def test_survey_counts_match_live_registry():
    registry.load_all()
    registered, oracled, rows_only = _survey_counts()
    live_reg = len(registry.QUERIES)
    live_or = len(registry.ORACLES)
    assert (registered, oracled, rows_only) == (
        live_reg,
        live_or,
        live_reg - live_or,
    ), (
        f"SURVEY.md §2.0 claims {registered} registered / {oracled} "
        f"oracled / {rows_only} rows-only, but the live registry is "
        f"{live_reg} / {live_or} / {live_reg - live_or} — refresh the "
        "§2.0 paragraph"
    )


def test_survey_counts_sum():
    registered, oracled, rows_only = _survey_counts()
    assert oracled + rows_only == registered
