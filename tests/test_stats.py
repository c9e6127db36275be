"""Stats + invariant tests (ref deduplicate.py:1319-1398, exercised by every
reference e2e test)."""

import pytest

from pysparkdedup.config import DedupConfig
from pysparkdedup.pipeline import run_and_check
from pysparkdedup.stats import Stat, StatsInconsistency, check_stats
from tests.conftest import ts


def test_stats_accounting(pages_factory):
    rows = [
        # exact pair -> 1 selected + 1 discarded
        ("u/dup1", ts(0), "pair text", "en"),
        ("u/dup2", ts(1), "pair text", "en"),
        # singleton
        ("u/solo", ts(0), "solo text", "en"),
        # rejected
        ("u/bad", ts(0), "", "en"),
        # skipped set (same ts, single strategy can't discriminate)
        ("u/sk1", ts(5), "skip text", "en"),
        ("u/sk2", ts(5), "skip text", "en"),
    ]
    cfg = DedupConfig(strategies=("select-newest",))
    res = run_and_check(pages_factory(rows), cfg)
    s = res.stats
    assert s[Stat.MAIL_FOUND] == 6
    assert s[Stat.MAIL_REJECTED] == 1
    assert s[Stat.MAIL_RETAINED] == 5
    assert s[Stat.MAIL_UNIQUE] == 1
    assert s[Stat.MAIL_DUPLICATES] == 4
    assert s[Stat.MAIL_SELECTED] == 1
    assert s[Stat.MAIL_DISCARDED] == 1
    assert s[Stat.MAIL_SKIPPED] == 2
    assert s[Stat.SET_TOTAL] == 3
    assert s[Stat.SET_SINGLE] == 1
    assert s[Stat.SET_DEDUPLICATED] == 1
    assert s[Stat.SET_SKIPPED_STRATEGY] == 1


def test_check_stats_raises_on_violation():
    stats = {s: 0 for s in Stat}
    stats[Stat.MAIL_FOUND] = 5
    stats[Stat.MAIL_REJECTED] = 1
    stats[Stat.MAIL_RETAINED] = 3  # violates FOUND == REJECTED + RETAINED
    with pytest.raises(StatsInconsistency):
        check_stats(stats)
