"""Pin the planted fixture positives (r12 verdict #8).

Five queries were vacuously green for ten rounds (0 rows on BOTH engines)
until r12 planted fixture positives — stratified-sample rate keys,
Q11-threshold re-base, last-char-deletion vocabulary, tail-as-head
continuation shards, vowel-rotation confusables. A fixture regen (or a
MAY_BE_EMPTY expansion) could silently re-empty them without tripping the
oracle gate, so each is pinned non-empty at sf0.01 here.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"

FORMERLY_VACUOUS = [
    "sample_stratified_by_source",
    "showcase_important_parts_q11",
    "dedup_symspell_deletions",
    "text_dedup_boundary_overlap",
    "text_phonetic_confusion_sets",
]


@pytest.mark.parametrize("name", FORMERLY_VACUOUS)
def test_formerly_vacuous_query_has_rows(spark, name):
    from etl_aws_spark import registry

    n = registry.all_queries()[name](spark, SF).count()
    assert n > 0, (
        f"{name} returned 0 rows at sf0.01 — its planted fixture positives "
        "regressed; a green oracle match would be vacuous again (r11 #1)"
    )
