"""bench.py outlier self-adjudication — pure-function tests.

The round-7 driver bench shipped a 236 s headline that was entirely host
contention (the same code measured 104 s on a quiet host). These tests
replay that round's actual maps (tests/data/bench_replay_r7.json:
`polluted` = the driver-run warm map, `quiet` = the quiet-host refresh at
commit e60d6c1) through bench.adjudicate and require the adjusted total to
land within 15% of the quiet-host truth — the round-8 "done" criterion.
Also pins the ADVICE r7 zero-division guard (a 0.0 counterpart is an
automatic swing, never a crash) and that genuine regressions survive
adjudication un-adjusted.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _rel, adjudicate  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "bench_replay_r7.json")


@pytest.fixture(scope="module")
def replay():
    with open(FIXTURE) as f:
        return json.load(f)


class TestReplayR7:
    def test_adjusted_total_recovers_quiet_host_truth(self, replay):
        """Replaying r7: warm = polluted driver map, prior = r6-era quiet
        map, reruns land at quiet-host values (the host is quiet by the
        time the rerun happens, as r7's in-process top-3 reruns showed:
        19.91->0.48, 39.24->1.47, 12.78->0.93). adjusted_total must land
        within 15% of the quiet total instead of shipping 236 s."""
        polluted, quiet = replay["polluted"], replay["quiet"]
        rerun, ambient, _, adjusted = adjudicate(
            polluted, quiet, lambda n: quiet[n]
        )
        quiet_total = replay["quiet_total"]
        assert abs(adjusted / quiet_total - 1) <= 0.15, (
            f"adjusted {adjusted} vs quiet {quiet_total}"
        )
        # The big known-ambient offenders must all be flagged.
        for name in ("decontaminate", "attribution", "cosine_topk", "winnow"):
            assert name in ambient
        # And every flagged query was actually re-measured.
        assert set(ambient) <= set(rerun)

    def test_rerun_count_bounded_by_swings_not_registry(self, replay):
        polluted, quiet = replay["polluted"], replay["quiet"]
        rerun, _, _, _ = adjudicate(polluted, quiet, lambda n: quiet[n])
        # Only genuinely swinging queries re-run — not all 129.
        assert 0 < len(rerun) < len(polluted)

    def test_quiet_round_adjusts_nothing(self, replay):
        """warm == prior (both quiet): no swings, no reruns, adjusted ==
        plain total."""
        quiet = replay["quiet"]
        calls = []

        def boom(n):
            calls.append(n)
            return quiet[n]

        rerun, ambient, _, adjusted = adjudicate(quiet, quiet, boom)
        assert rerun == {} and ambient == [] and calls == []
        assert adjusted == round(sum(quiet.values()), 3)


class TestGenuineChanges:
    def test_real_regression_survives_unadjusted(self):
        """A 2x regression that reproduces on rerun is NOT ambient and
        keeps its warm number in the adjusted total."""
        prior = {"q": 1.0, "r": 0.5}
        warm = {"q": 2.0, "r": 0.5}
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 2.05)
        assert rerun == {"q": 2.05}
        assert ambient == []
        assert adjusted == 2.5

    def test_real_speedup_survives_unadjusted(self):
        prior = {"q": 2.0}
        warm = {"q": 0.9}
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 0.92)
        assert ambient == []
        assert adjusted == 0.9

    def test_ambient_inflation_substitutes_rerun(self):
        prior = {"q": 1.0, "r": 1.0}
        warm = {"q": 10.0, "r": 1.0}  # q inflated 10x by host load
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 1.02)
        assert ambient == ["q"]
        assert adjusted == round(1.02 + 1.0, 3)

    def test_polluted_rerun_never_inflates_adjusted_total(self):
        """Review fix: warm shows a real 2x regression, but the RERUN
        lands at 3.0s because a load spike hit it — the unstable rule
        flags the query (one rerun can't disambiguate), yet the
        adjusted total must charge min(warm, rerun)=2.0, never a value
        above what was actually measured."""
        prior = {"q": 1.0}
        warm = {"q": 2.0}
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 3.0)
        assert ambient == ["q"]  # unstable: honestly flagged
        assert adjusted == 2.0  # but never inflated past a measurement

    def test_fluke_fast_warm_not_locked_in(self):
        """Review fix #2: a lucky-cache warm (0.9s vs prior 2.0s) whose
        rerun lands back at prior is ambient — and the adjusted total
        must charge the rerun (the quiet truth), not lock in the
        phantom speedup as a plain min() would."""
        prior = {"q": 2.0}
        warm = {"q": 0.9}
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 2.0)
        assert ambient == ["q"]
        assert adjusted == 2.0

    def test_small_queries_below_floor_ignored(self):
        """Sub-0.3 s queries swing wildly from scheduler noise — never
        re-run them."""
        prior = {"q": 0.05}
        warm = {"q": 0.2}  # 4x, but both under the floor
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 0.1)
        assert rerun == {} and ambient == []
        assert adjusted == 0.2


class TestZeroGuard:
    """ADVICE r7: a warm time that rounded to 0.0 must not raise
    ZeroDivisionError after the whole suite already executed."""

    def test_rel_zero_denominator(self):
        assert _rel(0.5, 0.0) == float("inf")
        assert _rel(0.0, 0.0) == 0.0
        assert _rel(0.0, 0.5) == 1.0

    def test_prior_zero_is_automatic_swing(self):
        prior = {"q": 0.0}
        warm = {"q": 0.5}
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 0.5)
        # Re-measured (automatic swing), reproduces -> genuine, not ambient.
        assert rerun == {"q": 0.5}
        assert ambient == []
        assert adjusted == 0.5

    def test_warm_zero_no_crash(self):
        prior = {"q": 0.5}
        warm = {"q": 0.0}
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 0.0)
        # rerun stable at warm (rel(0,0)=0) and away from prior -> genuine.
        assert ambient == []
        assert adjusted == 0.0

    def test_rerun_zero_with_inflated_warm_is_ambient(self):
        prior = {"q": 0.5}
        warm = {"q": 5.0}
        rerun, ambient, _, adjusted = adjudicate(warm, prior, lambda n: 0.0)
        # rel(rerun, warm) = 1.0 > 0.15 -> unstable -> ambient.
        assert ambient == ["q"]
        assert adjusted == 0.0


class TestRerunCap:
    """ADVICE r8: adjudication reruns are capped at the largest swings so
    a fully contended host can't double suite wall-clock with ~130 noisy
    reruns."""

    def test_cap_keeps_largest_swings(self):
        prior = {f"q{i}": 1.0 for i in range(100)}
        # q0 swings 101x, q1 swings ~51x, ... q99 barely over threshold
        warm = {f"q{i}": 1.0 + (100 - i) for i in range(100)}
        rerun, ambient, _, _ = adjudicate(
            warm, prior, lambda n: prior[n], max_reruns=5
        )
        assert len(rerun) == 5
        assert set(rerun) == {"q0", "q1", "q2", "q3", "q4"}
        # the capped-out swings are NOT flagged ambient (never re-measured)
        assert set(ambient) == set(rerun)

    def test_default_cap_covers_r7_pollution(self, replay):
        """The r7 polluted round had fewer than max_reruns genuine swings
        — the default cap must not change its adjudication."""
        polluted, quiet = replay["polluted"], replay["quiet"]
        _, _, _, adjusted = adjudicate(polluted, quiet, lambda n: quiet[n])
        assert abs(adjusted / replay["quiet_total"] - 1) <= 0.15


class TestCredibleMap:
    def test_returned_map_is_the_single_source_of_truth(self, replay):
        """adjudicate returns the adjudicated per-query map itself
        (review fix: main() used to rebuild it, a silent-divergence
        seam): the returned map must equal a fresh credible_map call
        and sum to adjusted_total."""
        from bench import credible_map

        polluted, quiet = replay["polluted"], replay["quiet"]
        rerun, ambient, amap, adjusted = adjudicate(
            polluted, quiet, lambda n: quiet[n]
        )
        assert amap == credible_map(polluted, quiet, rerun, ambient)
        assert set(amap) == set(polluted)
        assert round(sum(amap.values()), 3) == adjusted


class TestFindRegressions:
    """VERDICT r8 #2: the trend gate flags queries whose ADJUDICATED value
    exceeds the same-sf trend median by >25% and >=0.5 s absolute."""

    def _history(self):
        return [
            {"q_stable": 2.0, "q_regressed": 1.0, "q_small": 0.2},
            {"q_stable": 2.1, "q_regressed": 1.1, "q_small": 0.25},
            {"q_stable": 1.9, "q_regressed": 0.9, "q_small": 0.18},
        ]

    def test_real_regression_flagged(self):
        from bench import find_regressions

        adjusted = {"q_stable": 2.05, "q_regressed": 1.8, "q_small": 0.2}
        assert find_regressions(adjusted, self._history()) == ["q_regressed"]

    def test_absolute_floor_suppresses_tiny_queries(self):
        """q_small doubles (0.2 -> 0.4) — over the relative threshold but
        under the 0.5 s absolute floor; scheduler noise, never flagged."""
        from bench import find_regressions

        adjusted = {"q_small": 0.4}
        assert find_regressions(adjusted, self._history()) == []

    def test_relative_threshold_suppresses_slow_drift(self):
        """+0.6 s on a 2.0 s query is 30% -> flagged; +0.4 s (20%) is
        within the threshold even though it clears the absolute floor...
        both conditions must hold."""
        from bench import find_regressions

        hist = self._history()
        assert find_regressions({"q_stable": 2.6}, hist) == ["q_stable"]
        assert find_regressions({"q_stable": 2.4}, hist) == []

    def test_new_query_without_history_never_flags(self):
        from bench import find_regressions

        assert find_regressions({"q_new": 99.0}, self._history()) == []

    def test_speedup_never_flags(self):
        from bench import find_regressions

        assert find_regressions({"q_stable": 0.5}, self._history()) == []

    def test_median_resists_one_polluted_entry(self):
        """One contended ledger entry (q at 10 s) must not raise the
        median enough to mask a real regression against the quiet trend."""
        from bench import find_regressions

        hist = [{"q": 1.0}, {"q": 1.1}, {"q": 10.0}]
        assert find_regressions({"q": 1.8}, hist) == ["q"]

    def test_empty_history_no_flags(self):
        from bench import find_regressions

        assert find_regressions({"q": 5.0}, []) == []


class TestLoadHistory:
    """Review fix: bench_full.json's warm map must not double-count a
    round the ledger already carries — the warm copy holds exactly the
    polluted values credible_map rejected, so the duplicate biased the
    trend median toward noise and could mask a real regression."""

    def _write(self, tmp_path, lines):
        p = tmp_path / "trend.jsonl"
        p.write_text("".join(json.dumps(e) + "\n" for e in lines))
        return str(p)

    def test_prior_excluded_once_ledger_has_entries(self, tmp_path):
        from bench import find_regressions, load_history

        # round N was contended: warm q=3.0 (bench_full), adjudicated 1.0
        ledger = [
            {"sf": 0.1, "queries_adjusted": {"q": 1.0}},
            {"sf": 0.1, "queries_adjusted": {"q": 1.1}},
        ]
        prior_warm = {"q": 3.0}
        hist = load_history(
            self._write(tmp_path, ledger), 0.1, prior_warm
        )
        assert hist == [{"q": 1.0}, {"q": 1.1}]
        # a real regression to 1.9 s (median 1.05) must flag — with the
        # polluted prior double-counted the median was 1.1->... 3.0 in
        # play and the gate stayed silent
        assert find_regressions({"q": 1.9}, hist) == ["q"]

    def test_prior_bootstraps_empty_ledger(self, tmp_path):
        from bench import load_history

        hist = load_history(
            self._write(tmp_path, []), 0.1, {"q": 2.0}
        )
        assert hist == [{"q": 2.0}]

    def test_cross_sf_and_legacy_entries_skipped(self, tmp_path):
        from bench import load_history

        ledger = [
            {"sf": 0.001, "queries_adjusted": {"q": 9.0}},  # other sf
            {"sf": 0.1, "value": 100.0},  # legacy: no per-query map
        ]
        hist = load_history(
            self._write(tmp_path, ledger), 0.1, {"q": 2.0}
        )
        assert hist == [{"q": 2.0}]  # bootstrap only

    def test_missing_file_returns_prior_only(self, tmp_path):
        from bench import load_history

        assert load_history(
            str(tmp_path / "absent.jsonl"), 0.1, {"q": 1.0}
        ) == [{"q": 1.0}]

    def test_contended_entries_quarantined(self, tmp_path):
        """A ledger entry the sentinel stamped contended must not feed
        the trend median — its adjudication ran under the same shifting
        load that caused the swings."""
        from bench import load_history

        ledger = [
            {"sf": 0.1, "queries_adjusted": {"q": 1.0}},
            {"sf": 0.1, "contended": True,
             "queries_adjusted": {"q": 5.0}},
        ]
        hist = load_history(
            self._write(tmp_path, ledger), 0.1, {"q": 9.0}
        )
        assert hist == [{"q": 1.0}]
