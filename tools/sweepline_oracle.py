#!/usr/bin/env python3
"""Independent sweep-line oracle for q_interval_coverage.

Adjudicates the engine's interval-island merge WITHOUT any SQL window
function: DuckDB 1.0.0's out-of-core window path was observed to wobble
non-deterministically at the 60M-row 100x corpus (differing supplier
sets between identical runs on identical bytes — PERF_NOTES "r14 third
wave"), so this oracle recomputes the islands from first principles in
pure Python/numpy over the raw lineitem columns and compares against a
Verify dump of q_interval_coverage.

Usage:
    python3 tools/sweepline_oracle.py <sf_dir> <verify_out_dir>
    # e.g. python3 tools/sweepline_oracle.py /root/testdata/sf0.01 /tmp/verify_sf01

Semantics mirrored (see EventQueries.scala q_interval_coverage): per
supplier, interval = [date(l_shipdate), date(l_shipdate) +
floor(l_quantity) days]; sorted by (st, en), an interval opens a new
island iff st > max(en) of everything before it; output per supplier =
(n_islands, covered_days = sum over islands of (ien - ist + 1)).

Exit 0 and "OK <n> suppliers exact" when every supplier matches;
exit 1 with per-supplier diffs otherwise.
"""
import sys
import glob
import numpy as np
import pyarrow.parquet as pq
import pyarrow.compute as pc
import pyarrow as pa


def read_table(pattern_base):
    files = sorted(glob.glob(pattern_base + "/*.parquet")) or [pattern_base]
    return pa.concat_tables([pq.read_table(f) for f in files])


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]

    li = read_table(f"{sf_dir}/lineitem.parquet").select(
        ["l_suppkey", "l_shipdate", "l_quantity"])
    supp = li.column("l_suppkey").to_numpy().astype(np.int64)
    ship = li.column("l_shipdate")
    # l_shipdate may arrive as date32 or timestamp depending on the
    # generator; normalize to integer days since epoch
    if pa.types.is_timestamp(ship.type):
        ship = pc.cast(ship, pa.date32())
    st = ship.combine_chunks().to_numpy(zero_copy_only=False)
    st = st.astype("datetime64[D]").astype(np.int64)
    qty = np.floor(li.column("l_quantity").to_numpy().astype(np.float64)).astype(np.int64)
    en = st + qty

    # vectorized grouped sweep: sort by (supp, st, en); within each
    # supplier run, an island opens where st > cummax(en) of the PRIOR
    # rows. The cummax/segmenting below is plain numpy, no SQL engine.
    order = np.lexsort((en, st, supp))
    supp, st, en = supp[order], st[order], en[order]
    new_supp = np.ones(len(supp), dtype=bool)
    new_supp[1:] = supp[1:] != supp[:-1]

    # per-supplier running max of en over PRECEDING rows: segmented
    # inclusive cummax via the offset trick (shift each supplier segment
    # into a disjoint value range so one global np.maximum.accumulate
    # cannot leak across segments), then shift by one row per segment
    seg_id = np.cumsum(new_supp) - 1
    BIG = np.int64(1) << 40
    assert en.max() < BIG and en.min() > -BIG, "date range exceeds offset trick"
    shifted = en + seg_id * (2 * BIG)
    inc_cummax = np.maximum.accumulate(shifted) - seg_id * (2 * BIG)
    prior_max = np.empty_like(inc_cummax)
    prior_max[1:] = inc_cummax[:-1]
    prior_max[new_supp] = np.iinfo(np.int64).min  # first row: always opens
    new_island = st > prior_max
    new_island |= new_supp

    island_id = np.cumsum(new_island) - 1
    # per-island aggregates: first st (sorted -> min), max en
    n_islands_total = island_id[-1] + 1 if len(island_id) else 0
    # first occurrence of each island is its min st (sorted by st)
    first_of_island = np.ones(len(island_id), dtype=bool)
    first_of_island[1:] = island_id[1:] != island_id[:-1]
    ist = st[first_of_island]
    ien = np.full(n_islands_total, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.at(ien, island_id, en)
    island_supp = supp[first_of_island]

    # per-supplier rollup
    covered = ien - ist + 1
    supp_of_island_changes = np.ones(n_islands_total, dtype=bool)
    supp_of_island_changes[1:] = island_supp[1:] != island_supp[:-1]
    supp_seg = np.cumsum(supp_of_island_changes) - 1
    n_supp = supp_seg[-1] + 1 if n_islands_total else 0
    exp_supp = island_supp[supp_of_island_changes]
    exp_n = np.zeros(n_supp, dtype=np.int64)
    np.add.at(exp_n, supp_seg, 1)
    exp_days = np.zeros(n_supp, dtype=np.int64)
    np.add.at(exp_days, supp_seg, covered)

    got = read_table(f"{out_dir}/q_interval_coverage")
    got_supp = got.column("l_suppkey").to_numpy().astype(np.int64)
    got_n = got.column("n_islands").to_numpy().astype(np.int64)
    got_days = got.column("covered_days").to_numpy().astype(np.int64)
    g_order = np.argsort(got_supp, kind="stable")
    got_supp, got_n, got_days = got_supp[g_order], got_n[g_order], got_days[g_order]

    ok = (len(exp_supp) == len(got_supp)
          and np.array_equal(exp_supp, got_supp)
          and np.array_equal(exp_n, got_n)
          and np.array_equal(exp_days, got_days))
    if ok:
        print(f"OK {len(exp_supp)} suppliers exact")
        return 0
    exp_map = {int(s): (int(n), int(d)) for s, n, d in zip(exp_supp, exp_n, exp_days)}
    got_map = {int(s): (int(n), int(d)) for s, n, d in zip(got_supp, got_n, got_days)}
    bad = 0
    for s in sorted(set(exp_map) | set(got_map)):
        if exp_map.get(s) != got_map.get(s):
            bad += 1
            if bad <= 20:
                print(f"DIFF supplier {s}: python={exp_map.get(s)} spark={got_map.get(s)}")
    print(f"FAIL {bad} suppliers differ (of {len(exp_map)})")
    return 1


if __name__ == "__main__":
    sys.exit(main())
