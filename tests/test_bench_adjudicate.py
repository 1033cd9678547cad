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
        """Review fix #2 (revised r10, VERDICT r9 #6): a lucky-cache
        warm (0.9s vs prior 2.0s) whose rerun lands back at prior is
        ambient. The LEDGER map charges the rerun (the quiet truth) so
        the trend never locks in the phantom speedup — but the headline
        adjusted_total is capped at the measured warm value, because
        "adjusted" must mean NOT WORSE than what this run measured
        (r9's headline read 125.7 adjusted over 119.5 raw, a penalty)."""
        prior = {"q": 2.0}
        warm = {"q": 0.9}
        rerun, ambient, amap, adjusted = adjudicate(warm, prior, lambda n: 2.0)
        assert ambient == ["q"]
        assert amap == {"q": 2.0}  # trend ledger: anti-phantom-speedup
        assert adjusted == 0.9  # headline: never exceeds a measurement

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
        from bench import capped_adjusted_total

        assert capped_adjusted_total(polluted, amap) == adjusted
        # the headline never exceeds the raw measured total (r10)
        assert adjusted <= round(sum(polluted.values()), 3)


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
        assert hist == [
            {"queries": {"q": 1.0}, "sentinel": None, "sentinel_io": None},
            {"queries": {"q": 1.1}, "sentinel": None, "sentinel_io": None},
        ]
        # a real regression to 1.9 s (median 1.05) must flag — with the
        # polluted prior double-counted the median was 1.1->... 3.0 in
        # play and the gate stayed silent
        assert find_regressions({"q": 1.9}, hist) == ["q"]

    def test_prior_bootstraps_empty_ledger(self, tmp_path):
        from bench import load_history

        hist = load_history(
            self._write(tmp_path, []), 0.1, {"q": 2.0}
        )
        assert hist == [{"queries": {"q": 2.0}, "sentinel": None}]

    def test_cross_sf_and_legacy_entries_skipped(self, tmp_path):
        from bench import load_history

        ledger = [
            {"sf": 0.001, "queries_adjusted": {"q": 9.0}},  # other sf
            {"sf": 0.1, "value": 100.0},  # legacy: no per-query map
        ]
        hist = load_history(
            self._write(tmp_path, ledger), 0.1, {"q": 2.0}
        )
        # bootstrap only
        assert hist == [{"queries": {"q": 2.0}, "sentinel": None}]

    def test_missing_file_returns_prior_only(self, tmp_path):
        from bench import load_history

        assert load_history(
            str(tmp_path / "absent.jsonl"), 0.1, {"q": 1.0}
        ) == [{"queries": {"q": 1.0}, "sentinel": None}]

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
        assert hist == [
            {"queries": {"q": 1.0}, "sentinel": None, "sentinel_io": None}
        ]


class TestHostSpeedIndex:
    """VERDICT r9 #1: the run's contention sentinel over the trend
    median's — the host-speed index the regression gate normalizes by."""

    def test_index_vs_history_median(self):
        from bench import host_speed_index

        hist = [
            {"queries": {"q": 1.0}, "sentinel": 2.0},
            {"queries": {"q": 1.0}, "sentinel": 2.2},
            {"queries": {"q": 1.0}, "sentinel": 1.8},
        ]
        assert host_speed_index(3.0, hist) == 1.5
        assert host_speed_index(2.0, hist) == 1.0

    def test_none_without_sentinels(self):
        from bench import host_speed_index

        legacy = [{"q": 1.0}, {"queries": {"q": 1.0}, "sentinel": None}]
        assert host_speed_index(3.0, legacy) is None
        assert host_speed_index(None, [{"queries": {}, "sentinel": 2.0}]) is None


class TestHostNormalizedGate:
    """The r10 trend gate compares in the CURRENT run's host-seconds:
    history values scale by sentinel_now/sentinel_then, the absolute
    floor scales by the host index."""

    def _hist(self, sentinel=2.0):
        return [
            {"queries": {"q": 2.0, "r": 1.0}, "sentinel": sentinel},
            {"queries": {"q": 2.1, "r": 1.1}, "sentinel": sentinel},
            {"queries": {"q": 1.9, "r": 0.9}, "sentinel": sentinel},
        ]

    def test_uniformly_slow_host_flags_nothing(self):
        from bench import find_regressions

        # host 1.6x slower; every query 1.6x its trend — pure host
        adjusted = {"q": 3.2, "r": 1.6}
        assert find_regressions(adjusted, self._hist(), sentinel=3.2) == []
        # ... while the UNNORMALIZED gate (no sentinels) would flag both
        legacy_hist = [e["queries"] for e in self._hist()]
        assert find_regressions(adjusted, legacy_hist) == ["q", "r"]

    def test_real_regression_still_flags_on_slow_host(self):
        from bench import find_regressions

        # host 1.5x slower, q at 3x its trend: 2x beyond the host index
        adjusted = {"q": 6.0, "r": 1.5}
        assert find_regressions(
            adjusted, self._hist(), sentinel=3.0
        ) == ["q"]

    def test_fast_host_unmasks_disguised_regression(self):
        from bench import find_regressions

        # host 2x FASTER (sentinel 1.0 vs trend 2.0): a query merely
        # matching its old wall-clock is a 2x regression in host-seconds
        adjusted = {"q": 2.0, "r": 0.5}
        assert find_regressions(
            adjusted, self._hist(), sentinel=1.0
        ) == ["q"]

    def test_legacy_history_degrades_to_unscaled(self):
        from bench import find_regressions

        legacy_hist = [{"q": 2.0}, {"q": 2.1}, {"q": 1.9}]
        assert find_regressions(
            {"q": 3.2}, legacy_hist, sentinel=3.2
        ) == ["q"]


class TestReplayR9:
    """VERDICT r9 #1 'done' criterion: the r9 driver round ran on a
    post-restart slow host and its shipped gate flagged 10 regressions —
    all phantom (the judge's quiet rerun of the same HEAD put every one
    back at trend). tests/data/bench_replay_r9.json snapshots that
    round's ACTUAL adjudicated map and its preceding uncontended ledger
    history; the r10 gate must recover ~0 from the same data."""

    @pytest.fixture(scope="class")
    def r9(self):
        p = os.path.join(
            os.path.dirname(__file__), "data", "bench_replay_r9.json"
        )
        with open(p) as f:
            return json.load(f)

    def test_shipped_gate_reproduces_the_10_flags(self, r9):
        from bench import find_regressions

        flags = find_regressions(r9["polluted_adjusted"], r9["history"])
        assert flags == sorted(r9["driver_flags"])

    def test_normalized_gate_plus_quarantine_recovers_zero(self, r9):
        """Had the sentinel been recorded, the post-restart host would
        have read well past HOST_INDEX_QUARANTINE (the same HEAD
        measured 175.9 s vs 119.5 s quiet — ~1.47x; individual affected
        queries 1.6-7x, i.e. the contention was NOT uniform). The r10
        gate first rescales by the index (at 1.47 that alone clears 4
        of 10), then — because the host is quarantine-slow — demotes
        the survivors to regressions_host_suspect, so the headline
        n_regressions a slow host can produce is ZERO."""
        from bench import HOST_INDEX_QUARANTINE, find_regressions

        S = 2.0  # trend host sentinel (arbitrary unit)
        hist = [{"queries": h, "sentinel": S} for h in r9["history"]]
        host_index = 175.931 / 119.483  # the measured total ratio
        flags = find_regressions(
            r9["polluted_adjusted"], hist, sentinel=S * host_index
        )
        # scaling alone clears the uniform component...
        assert len(flags) < len(r9["driver_flags"])
        # ...and the quarantine (main() demotes when index > 1.25)
        # zeroes the headline — exactly r9's false-signal shape
        assert host_index > HOST_INDEX_QUARANTINE
        suspect, headline = flags, []
        assert headline == [] and set(suspect) <= set(r9["driver_flags"])

    def test_quiet_host_on_same_history_flags_nothing(self, r9):
        """The judge's quiet rerun an hour later (119.5 s,
        quiet_adjusted) recorded 0 regressions against all prior ledger
        entries (the polluted one included) — the normalized gate must
        agree both unscaled (its faithful replay) and with an at-trend
        sentinel (scale 1.0 reduces to the shipped gate)."""
        from bench import find_regressions

        hist_maps = r9["history"] + [r9["polluted_adjusted"]]
        assert find_regressions(r9["quiet_adjusted"], hist_maps) == []
        S = 2.0
        wrapped = [{"queries": h, "sentinel": S} for h in hist_maps]
        assert find_regressions(
            r9["quiet_adjusted"], wrapped, sentinel=S
        ) == []


class TestCappedAdjustedTotal:
    def test_never_exceeds_raw(self):
        from bench import capped_adjusted_total

        warm = {"a": 1.0, "b": 2.0}
        adjusted = {"a": 3.0, "b": 1.5}  # a's credible value is higher
        assert capped_adjusted_total(warm, adjusted) == 2.5
        assert capped_adjusted_total(warm, adjusted) <= sum(warm.values())

    def test_missing_adjusted_entry_charges_warm(self):
        from bench import capped_adjusted_total

        assert capped_adjusted_total({"a": 1.0}, {}) == 1.0


class TestQuarantineFlags:
    """Host-noise demotion triggers (r10): contended sentinel, host
    index at/past 1.25, or a mass flag count — each turns the headline
    regressions into regressions_host_suspect."""

    def test_live_r10_mass_flag_event(self):
        """Replay of the r10 in-round observation: a noisy-neighbor VM
        produced a 379 s run with 33 flags while the CPU sentinel read
        exactly 1.25 — one tick short of the old strict-> index gate.
        Both the >= boundary and the mass-flag trigger now demote it."""
        from bench import quarantine_flags

        flags = [f"q{i}" for i in range(33)]
        headline, suspect = quarantine_flags(flags, 133, 1.25, False)
        assert headline == [] and suspect == flags
        # with a fooled sentinel (index 1.0) the mass gate still fires,
        # corroborated by the event's measured breadth (1.479 on the
        # real ledger — the registry-median ratio saw what the CPU
        # sentinel missed)
        headline, suspect = quarantine_flags(
            flags, 133, 1.0, False, breadth=1.479, frac15=0.87
        )
        assert headline == [] and suspect == flags

    def test_uncorroborated_mass_flag_ships(self):
        """ADVICE r10: most bench queries share the txn core, so a
        genuine core regression can flag dozens at once — on a quiet
        host (index ~1.0, breadth ~1.0, non-flagged queries at trend)
        the mass-flag heuristic must NOT demote them."""
        from bench import quarantine_flags

        flags = [f"q{i}" for i in range(30)]
        headline, suspect = quarantine_flags(
            flags, 134, 1.02, False, breadth=1.04, frac15=0.2
        )
        assert headline == flags and suspect == []

    def test_mass_flag_without_history_demotes(self):
        """No history -> no breadth/frac/index: the old demote-by-
        default behavior holds (nothing to corroborate against, and a
        first-ledger-entry round has no trend to regress from anyway)."""
        from bench import quarantine_flags

        flags = [f"q{i}" for i in range(30)]
        headline, suspect = quarantine_flags(flags, 134, None, False)
        assert headline == [] and suspect == flags

    def test_plan_changed_flags_never_demoted(self):
        """VERDICT r10 #3: a flag whose physical plan changed since the
        previous ledger entry survives every demotion path — host-noise
        quarantine must not launder code evidence."""
        from bench import quarantine_flags

        flags = [f"q{i}" for i in range(33)]
        headline, suspect = quarantine_flags(
            flags, 133, 1.30, False, plan_changed={"q7", "q12"},
        )
        assert headline == ["q7", "q12"]
        assert "q7" not in suspect and len(suspect) == 31
        # contended runs too
        headline, suspect = quarantine_flags(
            ["a", "b"], 133, None, True, plan_changed={"b"},
        )
        assert headline == ["b"] and suspect == ["a"]

    def test_small_flag_counts_survive(self):
        from bench import quarantine_flags

        headline, suspect = quarantine_flags(["a", "b"], 133, 1.1, False)
        assert headline == ["a", "b"] and suspect == []
        # floor: up to max(4, 6) flags pass at 133 queries
        six = list("abcdef")
        headline, _ = quarantine_flags(six, 133, None, False)
        assert headline == six

    def test_contended_demotes(self):
        from bench import quarantine_flags

        assert quarantine_flags(["a"], 133, None, True) == ([], ["a"])

    def test_host_suspect_entries_excluded_from_history(self, tmp_path):
        from bench import load_history

        ledger = [
            {"sf": 0.1, "queries_adjusted": {"q": 1.0}},
            {"sf": 0.1, "host_suspect": True,
             "queries_adjusted": {"q": 3.0}},
        ]
        p = tmp_path / "trend.jsonl"
        p.write_text("".join(json.dumps(e) + "\n" for e in ledger))
        hist = load_history(str(p), 0.1, {})
        assert hist == [
            {"queries": {"q": 1.0}, "sentinel": None, "sentinel_io": None}
        ]


class TestReplayR10Events:
    """Round-11 replay of the REAL r10 host-noise events against the
    new whole-registry host signals, from a snapshot of the live trend
    ledger (tests/data/bench_replay_r10_ledger.jsonl — the actual
    bench_trend.jsonl as of round 11 start). Two events:

    - ts 1786881003: 379 s suite (quiet truth ~131 s), 33 flags, CPU
      sentinel index exactly 1.25 — IO/scheduler contention the CPU
      sentinel undermeasures.
    - ts 1786891891: 269.7 s driver run (quiet rerun 145.5 s), 8 flags,
      CPU index 1.2286, io sentinel 0.231 vs quiet 0.230 (the
      page-cache-warm IO sentinel ALSO missed it).

    The breadth signal (registry-median warm-vs-trend ratio) sees both
    without any mass-flag heuristic."""

    @pytest.fixture(scope="class")
    def ledger(self):
        path = os.path.join(
            os.path.dirname(__file__), "data",
            "bench_replay_r10_ledger.jsonl",
        )
        with open(path) as f:
            return [json.loads(line) for line in f]

    def _hist_before(self, ledger, ts):
        return [
            {"queries": e["queries_adjusted"],
             "sentinel": e.get("sentinel"),
             "sentinel_io": e.get("sentinel_io")}
            for e in ledger
            if e.get("sf") == 0.1 and e["ts"] < ts
            and not e.get("contended") and not e.get("host_suspect")
            and isinstance(e.get("queries_adjusted"), dict)
        ]

    def _event(self, ledger, ts):
        return next(e for e in ledger if e.get("ts") == ts)

    def test_379s_event_breadth_quarantines_alone(self, ledger):
        """The 379 s event's breadth reads past BREADTH_QUARANTINE on
        its real per-query map — the index-style signal quarantines it
        WITHOUT the mass-flag heuristic (VERDICT r10 #2 done criterion,
        adapted: the event predates the IO sentinel, and the later
        event showed the page-cache-warm IO sentinel blind to this
        contention class, so the whole-registry breadth is the
        fleet-wide signal that actually separates)."""
        from bench import BREADTH_QUARANTINE, quarantine_flags, suite_breadth

        ev = self._event(ledger, 1786881003)
        hist = self._hist_before(ledger, 1786881003)
        breadth, frac15 = suite_breadth(ev["queries_adjusted"], hist)
        assert breadth >= BREADTH_QUARANTINE, breadth  # measured 1.479
        # one flag, no mass trigger, CPU index forced quiet: breadth
        # alone demotes
        headline, suspect = quarantine_flags(
            ["any_query"], 133, 1.0, False, breadth=breadth, frac15=frac15
        )
        assert headline == [] and suspect == ["any_query"]

    def test_269s_event_mass_flag_corroborated(self, ledger):
        """The 269.7 s driver event: adjudication already substituted
        credible values (51 ambient), so its adjusted breadth is mild
        (~1.11) — below the standalone trigger but at/past the
        corroboration bar, and the CPU index (1.2286) corroborates
        independently. Its 8 flags demote; the headline stays clean."""
        from bench import MASS_FLAG_BREADTH, quarantine_flags, suite_breadth

        ev = self._event(ledger, 1786891891)
        hist = self._hist_before(ledger, 1786891891)
        breadth, _ = suite_breadth(ev["queries_adjusted"], hist)
        assert breadth >= MASS_FLAG_BREADTH, breadth  # measured 1.113
        flags = [f"q{i}" for i in range(8)]
        headline, suspect = quarantine_flags(
            flags, 134, ev["host_index"], False, breadth=breadth
        )
        assert headline == [] and suspect == flags

    def test_quiet_run_family_regression_ships(self, ledger):
        """The ADVICE r10 scenario on REAL quiet-run data: take the
        judge's quiet run (ts 1786893412, host_index 1.0214), inflate a
        10-query family 2x (a synthetic txn-core regression), and
        verify the mass flag is NOT corroborated — the flags ship."""
        from bench import quarantine_flags, suite_breadth

        ev = self._event(ledger, 1786893412)
        hist = self._hist_before(ledger, 1786893412)
        q = dict(ev["queries_adjusted"])
        family = sorted(q, key=q.get, reverse=True)[5:15]
        for n in family:
            q[n] = q[n] * 2
        breadth, frac15 = suite_breadth(
            q, hist, exclude=frozenset(family)
        )
        headline, suspect = quarantine_flags(
            family, len(q), ev["host_index"], False,
            breadth=breadth, frac15=frac15,
        )
        assert headline == family and suspect == []

    def test_quiet_run_breadth_below_triggers(self, ledger):
        """Threshold sanity on real data: the quiet judge run's breadth
        sits below both the corroboration bar and the standalone
        trigger."""
        from bench import (
            BREADTH_QUARANTINE,
            FRAC15_CORROBORATION,
            suite_breadth,
        )

        ev = self._event(ledger, 1786893412)
        hist = self._hist_before(ledger, 1786893412)
        breadth, frac15 = suite_breadth(ev["queries_adjusted"], hist)
        assert breadth < BREADTH_QUARANTINE
        assert frac15 < FRAC15_CORROBORATION


class TestCombinedHostIndex:
    def test_io_index_dominates_when_cpu_quiet(self):
        from bench import combined_host_index

        hist = [
            {"queries": {}, "sentinel": 0.20, "sentinel_io": 0.25},
            {"queries": {}, "sentinel": 0.21, "sentinel_io": 0.23},
            {"queries": {}, "sentinel": 0.19, "sentinel_io": 0.24},
        ]
        # CPU at trend, IO 2x slow -> combined reads the IO side
        idx = combined_host_index(0.20, 0.48, hist)
        assert idx == 2.0

    def test_cpu_only_history_degrades_gracefully(self):
        from bench import combined_host_index

        hist = [{"queries": {}, "sentinel": 0.20}]
        assert combined_host_index(0.30, 0.99, hist) == 1.5

    def test_none_without_any_history(self):
        from bench import combined_host_index

        assert combined_host_index(0.2, 0.2, []) is None


class TestIsolatedBaselines:
    """VERDICT r10 #1: committed fresh-JVM per-query baselines bound
    the trend gate — suite-aging drift moves the ledger medians, not
    the position-independent budget."""

    HIST = [
        {"queries": {"q": 1.0}, "sentinel": 0.2},
        {"queries": {"q": 1.1}, "sentinel": 0.2},
        {"queries": {"q": 1.2}, "sentinel": 0.2},
    ]

    def test_within_isolated_budget_never_flags(self):
        from bench import find_regressions

        # trend median 1.1; 2.0 flags without a baseline...
        assert find_regressions(
            {"q": 2.0}, self.HIST, sentinel=0.2
        ) == ["q"]
        # ...but sits within 25% of its isolated budget (1.8): no flag
        assert find_regressions(
            {"q": 2.0}, self.HIST, sentinel=0.2,
            isolated={"q": {"warm_median": 1.8, "sentinel": 0.2}},
        ) == []

    def test_genuine_regression_exceeds_both(self):
        from bench import find_regressions

        assert find_regressions(
            {"q": 3.0}, self.HIST, sentinel=0.2,
            isolated={"q": {"warm_median": 1.8, "sentinel": 0.2}},
        ) == ["q"]

    def test_isolated_budget_not_sentinel_rescaled(self):
        """The budget is a same-box absolute number: fresh-JVM sentinel
        samples are JIT-transient-noisy (measured 0.17-0.58 s across
        JVMs whose queries converged identically), so a sentinel ratio
        would inject noise into the budget. A slow-host run rescales
        its TREND comparison (existing behavior) but compares the
        budget as-is."""
        from bench import find_regressions

        # sentinel 0.4 vs trend 0.2: trend medians scale 2x (2.2), so
        # 2.6 doesn't flag the trend check at all on this host
        assert find_regressions(
            {"q": 2.6},
            [{"queries": {"q": v}, "sentinel": 0.2} for v in (1.0, 1.1, 1.2)],
            sentinel=0.4,
            isolated={"q": {"warm_median": 1.8, "sentinel": 0.2}},
        ) == []
        # same-sentinel host: 4.0 exceeds trend AND the absolute budget
        assert find_regressions(
            {"q": 4.0},
            [{"queries": {"q": v}, "sentinel": 0.2} for v in (1.0, 1.1, 1.2)],
            sentinel=0.2,
            isolated={"q": {"warm_median": 1.8, "sentinel": 0.2}},
        ) == ["q"]

    def test_missing_baseline_keeps_trend_behavior(self):
        from bench import find_regressions

        assert find_regressions(
            {"q": 2.0}, self.HIST, sentinel=0.2, isolated={}
        ) == ["q"]


class TestLedgerHygiene:
    """VERDICT r10 #6: sentinel-less pre-r10 entries drop from the
    medians once MIN_SENTINEL_HISTORY sentinel-bearing quiet entries
    exist for the sf."""

    def _ledger(self, n_old, n_new):
        old = [
            {"sf": 0.1, "queries_adjusted": {"q": 9.0}}
            for _ in range(n_old)
        ]
        new = [
            {"sf": 0.1, "sentinel": 0.2, "sentinel_io": 0.23,
             "queries_adjusted": {"q": 1.0}}
            for _ in range(n_new)
        ]
        return old + new

    def _load(self, tmp_path, lines):
        from bench import load_history

        p = tmp_path / "trend.jsonl"
        p.write_text("".join(json.dumps(e) + "\n" for e in lines))
        return load_history(str(p), 0.1, {})

    def test_old_entries_dropped_past_threshold(self, tmp_path):
        hist = self._load(tmp_path, self._ledger(3, 5))
        assert len(hist) == 5
        assert all(h["sentinel"] for h in hist)

    def test_old_entries_kept_below_threshold(self, tmp_path):
        hist = self._load(tmp_path, self._ledger(3, 4))
        assert len(hist) == 7

    def test_live_ledger_regenerated_gate(self):
        """Regenerated gate run over the LIVE ledger snapshot: with only
        2 sentinel-bearing quiet sf0.1 entries so far, the hygiene rule
        must NOT fire yet (history unchanged), and the gate still loads
        cleanly end to end."""
        from bench import MIN_SENTINEL_HISTORY, load_history

        path = os.path.join(
            os.path.dirname(__file__), "data",
            "bench_replay_r10_ledger.jsonl",
        )
        hist = load_history(path, 0.1, {})
        with_s = [h for h in hist if h.get("sentinel")]
        if len(with_s) >= MIN_SENTINEL_HISTORY:
            assert hist == with_s
        else:
            assert len(hist) > len(with_s)


class TestPlanFpHistory:
    def test_same_sf_entries_in_order(self, tmp_path):
        from bench import _plan_fp_history

        lines = [
            {"sf": 0.1, "plan_fp": {"q": "aaa"}},
            {"sf": 0.001, "plan_fp": {"q": "zzz"}},
            {"sf": 0.1, "host_suspect": True, "plan_fp": {"q": "bbb"}},
        ]
        p = tmp_path / "trend.jsonl"
        p.write_text("".join(json.dumps(e) + "\n" for e in lines))
        # quarantined entries still count: plans are timing-independent
        assert _plan_fp_history(str(p), 0.1) == [{"q": "aaa"}, {"q": "bbb"}]

    def test_empty_without_fp_entries(self, tmp_path):
        from bench import _plan_fp_history

        p = tmp_path / "trend.jsonl"
        p.write_text(json.dumps({"sf": 0.1, "value": 1.0}) + "\n")
        assert _plan_fp_history(str(p), 0.1) == []
        assert _plan_fp_history(str(tmp_path / "absent"), 0.1) == []


class TestStablePlanChanged:
    """VERDICT r11 #1b: the plan-change demotion exemption requires the
    fingerprint to have been STABLE across prior ledger entries."""

    def test_stable_then_changed_qualifies(self):
        from bench import stable_plan_changed

        hist = [{"q": "aaa"}, {"q": "aaa"}]
        assert stable_plan_changed({"q": "bbb"}, hist) == {"q"}

    def test_churning_fingerprint_never_qualifies(self):
        from bench import stable_plan_changed

        # tokenize_ids' real r11 shape: differs in every prior pair
        hist = [{"q": "aaa"}, {"q": "bbb"}, {"q": "ccc"}]
        assert stable_plan_changed({"q": "ddd"}, hist) == frozenset()

    def test_unchanged_fingerprint_never_qualifies(self):
        from bench import stable_plan_changed

        hist = [{"q": "aaa"}, {"q": "aaa"}]
        assert stable_plan_changed({"q": "aaa"}, hist) == frozenset()

    def test_single_prior_recording_is_not_evidence(self):
        from bench import stable_plan_changed

        assert stable_plan_changed({"q": "bbb"}, [{"q": "aaa"}]) == frozenset()
        assert stable_plan_changed({"q": "bbb"}, []) == frozenset()

    def test_only_last_two_recordings_matter(self):
        from bench import stable_plan_changed

        # old churn followed by two agreeing entries = stable now:
        # a real code change last round settles after two quiet runs
        hist = [{"q": "xxx"}, {"q": "aaa"}, {"q": "aaa"}]
        assert stable_plan_changed({"q": "bbb"}, hist) == {"q"}

    def test_queries_missing_from_history_skipped(self):
        from bench import stable_plan_changed

        hist = [{"other": "aaa"}, {"other": "aaa"}]
        assert stable_plan_changed({"q": "bbb"}, hist) == frozenset()


class TestChoosePrior:
    """VERDICT r11 #1a: the adjudication prior must be a QUIET run."""

    def _ledger(self, tmp_path, entries):
        p = tmp_path / "trend.jsonl"
        p.write_text("".join(json.dumps(e) + "\n" for e in entries))
        return str(p)

    def test_quiet_bench_full_wins(self, tmp_path):
        from bench import choose_prior

        prev = {"sf": 0.1, "queries": {"q": 1.0}, "sentinel": 0.14,
                "contended": False, "host_index": 1.0, "breadth": 1.02}
        path = self._ledger(tmp_path, [
            {"sf": 0.1, "queries_adjusted": {"q": 9.0}, "sentinel": 0.2},
        ])
        assert choose_prior(prev, 0.1, path) == ({"q": 1.0}, 0.14)

    def test_contended_bench_full_falls_back_to_quiet_ledger(self, tmp_path):
        from bench import choose_prior

        prev = {"sf": 0.1, "queries": {"q": 4.2}, "sentinel": 0.18,
                "contended": True, "host_index": 1.29, "breadth": 1.13}
        path = self._ledger(tmp_path, [
            {"sf": 0.1, "queries_adjusted": {"q": 2.0}, "sentinel": 0.14,
             "host_index": 0.98, "breadth": 1.07},
            {"sf": 0.1, "queries_adjusted": {"q": 4.0}, "sentinel": 0.18,
             "contended": True, "host_index": 1.29},
        ])
        assert choose_prior(prev, 0.1, path) == ({"q": 2.0}, 0.14)

    def test_host_suspect_full_and_ledger_skipped(self, tmp_path):
        from bench import choose_prior

        prev = {"sf": 0.1, "queries": {"q": 4.2}, "host_index": 1.88}
        path = self._ledger(tmp_path, [
            {"sf": 0.1, "queries_adjusted": {"q": 2.0}, "sentinel": 0.14},
            {"sf": 0.1, "queries_adjusted": {"q": 5.0}, "sentinel": 0.3,
             "host_suspect": True},
            {"sf": 0.1, "queries_adjusted": {"q": 6.0}, "sentinel": 0.3,
             "breadth": 1.4},
        ])
        assert choose_prior(prev, 0.1, path) == ({"q": 2.0}, 0.14)

    def test_cross_sf_full_rejected(self, tmp_path):
        from bench import choose_prior

        prev = {"sf": 0.01, "queries": {"q": 1.0}}
        path = self._ledger(tmp_path, [])
        assert choose_prior(prev, 0.1, path) == ({}, None)

    def test_no_quiet_candidate_empty_prior(self, tmp_path):
        from bench import choose_prior

        prev = {"sf": 0.1, "queries": {"q": 1.0}, "contended": True}
        path = self._ledger(tmp_path, [
            {"sf": 0.1, "queries_adjusted": {"q": 2.0}, "contended": True},
        ])
        assert choose_prior(prev, 0.1, path) == ({}, None)
        assert choose_prior(None, 0.1, str(tmp_path / "absent")) == ({}, None)


class TestReplayR11Phantom:
    """Replay of the ACTUAL r11 driver run (real artifacts committed as
    fixtures) — the round whose official BENCH headline shipped a
    phantom tokenize_ids regression through two gate gaps at once.
    Both fixes must flip the outcome on the real data."""

    def _fixtures(self):
        d = os.path.join(os.path.dirname(__file__), "data")
        with open(os.path.join(d, "bench_replay_r11_driver.json")) as f:
            driver = json.load(f)
        with open(os.path.join(d, "bench_replay_r11_prev_full.json")) as f:
            prev_full = json.load(f)
        ledger = os.path.join(d, "bench_replay_r11_ledger.jsonl")
        return driver, prev_full, ledger

    def test_prior_skips_the_contended_run(self):
        """choose_prior must reject the contended 158 s run's artifact
        (the actual prior the r11 driver adjudicated against) and land
        on the quiet 151 s ledger entry instead."""
        from bench import choose_prior

        driver, prev_full, ledger = self._fixtures()
        prior, sentinel = choose_prior(prev_full, 0.1, ledger)
        # the quiet ts-1786913694 entry: host_index 0.98, breadth 1.07
        assert sentinel == 0.139
        assert prior["tokenize_ids"] == 1.986

    def test_quiet_prior_kills_the_swing(self):
        """Against the quiet prior, tokenize_ids' warm 1.62 s is within
        the 15% adjudication threshold of 1.986 s-trend... not quite —
        it IS a swing (18% fast), but the rerun 3.204 lands >15% from
        warm, so the query flags ambient and credible_map charges the
        value closest to the QUIET prior (the warm 1.62), not the
        polluted rerun."""
        from bench import adjudicate

        driver, prev_full, ledger = self._fixtures()
        prior = {"tokenize_ids": 1.986}
        warm = {"tokenize_ids": driver["warm_tokenize_ids"]}
        rerun_vals = {"tokenize_ids": driver["rerun_tokenize_ids"]}
        rerun, ambient, adjusted, _ = adjudicate(
            warm, prior, lambda n: rerun_vals[n]
        )
        assert ambient == ["tokenize_ids"]
        assert adjusted["tokenize_ids"] == driver["warm_tokenize_ids"]

    def test_unstable_fingerprint_no_longer_blocks_demotion(self):
        """Even when the flag survives adjudication, the quarantine
        (host_index 1.88) must now demote it: tokenize_ids' fingerprint
        churned across every prior pair of identical-code ledger
        entries, so the plan-change exemption does not apply."""
        from bench import (
            _plan_fp_history,
            quarantine_flags,
            stable_plan_changed,
        )

        driver, prev_full, ledger = self._fixtures()
        # fingerprint history BEFORE the driver run = first 3 entries
        hist = _plan_fp_history(ledger, 0.1)[:-1]
        assert len(hist) == 3
        fps = [h["tokenize_ids"] for h in hist]
        assert len(set(fps)) == 3  # the real churn
        plan_changed = stable_plan_changed(driver["plan_fp"], hist)
        assert "tokenize_ids" not in plan_changed
        headline, suspect = quarantine_flags(
            ["tokenize_ids"],
            driver["n_queries"],
            driver["host_index"],
            False,
            breadth=driver["breadth"],
            frac15=driver["frac15"],
            plan_changed=plan_changed,
        )
        assert headline == []
        assert suspect == ["tokenize_ids"]


class TestBreadthBandRevalidation:
    """VERDICT r11 #4: second validation of the breadth gate over the
    FULL live ledger (snapshot fixture, 29 entries through r12's
    start). Replays suite_breadth chronologically — each entry scored
    against the quiet history before it — and pins the observed bands:

    - quiet entries from the instrumented era replay 0.95-1.12; the two
      pre-instrumentation drift rounds reach 1.16 — so MASS_FLAG_BREADTH
      (1.10) cannot tighten without mis-corroborating real quiet runs,
      and BREADTH_QUARANTINE (1.25) clears every quiet replay.
    - the true noisy-neighbor events (379 s / 592 s suites) replay
      1.41-1.61, comfortably past the quarantine trigger.
    - the r9 phantom-flag round (168.8 s, 24 flags, stamped quiet
      because it PREDATES the quarantine) replays at 1.41: today's gate
      would have quarantined the round that burned five bench runs."""

    @staticmethod
    def _replay():
        import bench

        path = os.path.join(
            os.path.dirname(__file__), "data",
            "bench_replay_r12_ledger.jsonl",
        )
        hist: list[dict] = []
        out = []
        with open(path) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                if e.get("sf") != 0.1 or not isinstance(
                    e.get("queries_adjusted"), dict
                ):
                    continue
                b, _ = bench.suite_breadth(e["queries_adjusted"], hist)
                quiet = not (e.get("contended") or e.get("host_suspect"))
                out.append((e["ts"], e["value"], quiet, b))
                if quiet:
                    hist.append(
                        {
                            "queries": e["queries_adjusted"],
                            "sentinel": e.get("sentinel"),
                        }
                    )
        return out

    def test_quiet_band_clears_quarantine(self):
        from bench import BREADTH_QUARANTINE

        rows = self._replay()
        # instrumented era = entries at/after the first sentinel-bearing
        # stamp; the r9 drift rounds (ts <= 1786850019) predate it
        quiet = [
            (ts, b) for ts, _v, q, b in rows
            if q and b is not None and ts > 1786850019
        ]
        assert len(quiet) >= 7
        assert max(b for _, b in quiet) < BREADTH_QUARANTINE
        # ...but quiet replays DO reach past 1.10: tightening
        # MASS_FLAG_BREADTH is not supportable on this ledger
        assert max(b for _, b in quiet) > 1.10

    def test_noisy_neighbor_events_flag(self):
        from bench import BREADTH_QUARANTINE

        rows = self._replay()
        events = {ts: b for ts, v, _q, b in rows if v > 350}
        assert events  # the 379 s and 592 s runs
        assert all(b >= 1.40 for b in events.values())
        assert all(b >= BREADTH_QUARANTINE for b in events.values())

    def test_r9_phantom_round_caught_retroactively(self):
        from bench import BREADTH_QUARANTINE

        rows = self._replay()
        r9 = next((b for ts, _v, _q, b in rows if ts == 1786848483), None)
        assert r9 is not None and r9 >= BREADTH_QUARANTINE


class TestSubsetPrior:
    """r12 subset mode: a partial (SPARK_GRAFT_QUERIES) run's map must
    never become the adjudication prior for a full suite."""

    def test_subset_entries_skipped(self, tmp_path):
        from bench import choose_prior

        p = tmp_path / "trend.jsonl"
        p.write_text(
            json.dumps({"sf": 1.0, "queries_adjusted": {"q": 2.0},
                        "sentinel": 0.14}) + "\n"
            + json.dumps({"sf": 1.0, "queries_adjusted": {"q": 9.0},
                          "sentinel": 0.14, "subset": True}) + "\n"
        )
        prev = {"sf": 1.0, "queries": {"q": 9.5}, "subset": True}
        assert choose_prior(prev, 1.0, str(p)) == ({"q": 2.0}, 0.14)
