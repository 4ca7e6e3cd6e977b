#!/usr/bin/env python3
"""At-scale DuckDB oracle for the iterative-graph queries on the Nx
CLONE corpus (q_dup_clusters, q_label_prop).

The registered oracles derive candidate pairs from a shingle SELF-JOIN,
which is infeasible on a 100x clone corpus: every shingle's occurrence
list grows Nx, so the join's intermediate blows up Nx^2 (the
q_fuzzy_decontam >77 GB class, PERF_NOTES r14). This tool derives the
SAME pair semantics through an exact clone-aware reformulation:

  - identical texts have identical shingle sets, so the qualifying
    doc-pair set is precisely the expansion of qualifying TEXT-GROUP
    pairs (cross-group: jaccard >= t between distinct texts; within a
    group of n >= 2 copies with >= 1 shingle: every pair, jaccard = 1);
  - q_dup_clusters: connected components run on the 1x-sized GROUP
    graph and expand at the end (component min doc_id = min gid, since
    gid = min member);
  - q_label_prop (r18 semantics): label propagation runs on the
    COLLAPSED graph — one node per distinct text, edges between
    representatives only — and every clone inherits its
    representative's community. The 3 unrolled rounds therefore run on
    the 1x-sized group graph (the r17 version materialized ~61M
    doc-level directed edges here; the collapsed semantics need none),
    each round materialized (the kCore oracle discipline).

Both results are value- and driver-hash-compared against Verify's
parquet dumps, exactly like tools/check.py.

Usage: python3 tools/graph_oracle_atscale.py <cloneCorpusDir> <verifyOutDir>
"""
import os
import sys

import duckdb

# one driver-mimic hash definition for both tools: a canonicalization
# fix in check.py must not silently diverge this tool's verdicts
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import driver_hash  # noqa: E402


def compare(con, name, expected_rel_name, out_dir):
    got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
    exp = con.sql(f"SELECT * FROM {expected_rel_name}")
    got_cols, exp_cols = sorted(got.columns), sorted(exp.columns)
    if got_cols != exp_cols:
        print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
        return False
    ng = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
    ne = con.sql(f"SELECT count(*) FROM {expected_rel_name}").fetchone()[0]
    if ng != ne:
        print(f"FAIL {name}: rows {ng} != {ne}")
        return False
    # exact anti-join both ways: the VALUE check runs in-engine so a
    # mismatch is found and reported (with a count) without pandas; the
    # driver-style hash below then still fetches both relations once —
    # it exists to catch dtype/serialization divergence the value
    # compare cannot see, not to re-check values
    cols = ", ".join(got_cols)
    diff = con.sql(
        f"SELECT count(*) FROM ((SELECT {cols} FROM '{out_dir}/{name}/*.parquet' "
        f"EXCEPT SELECT {cols} FROM {expected_rel_name}) UNION ALL "
        f"(SELECT {cols} FROM {expected_rel_name} EXCEPT "
        f"SELECT {cols} FROM '{out_dir}/{name}/*.parquet'))").fetchone()[0]
    if diff:
        print(f"FAIL {name}: {diff} rows differ")
        return False
    hg, he = driver_hash(got), driver_hash(exp)
    if hg != he:
        print(f"FAIL {name}: values equal but driver-style hash differs")
        return False
    print(f"PASS {name} ({ng} rows, value+hash)")
    return True


def main(corpus_dir, out_dir):
    con = duckdb.connect()
    path = f"{corpus_dir}/documents.parquet"
    src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
    con.sql(f"CREATE VIEW docs AS SELECT doc_id, text, lang FROM {src}")

    # ---- shared clone-aware pair derivation (1x-sized) ----
    con.sql("""CREATE TEMP TABLE g AS
      SELECT text, min(doc_id) AS gid, count(*) AS n FROM docs GROUP BY text""")
    con.sql("""CREATE TEMP TABLE sh AS
      SELECT gid, unnest(list_distinct(list_transform(
          range(1, greatest(len(string_split(text,' ')) - 1, 1)),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
               || ' ' || string_split(text,' ')[i+2]))) AS sh
      FROM g WHERE len(string_split(text,' ')) >= 3""")
    con.sql("CREATE TEMP TABLE sizes AS SELECT gid, count(*) AS n_sh FROM sh GROUP BY gid")
    con.sql("""CREATE TEMP TABLE tpairs AS
      SELECT ga, gb, CAST(ns AS DOUBLE) / (sa.n_sh + sb.n_sh - ns) AS j
      FROM (
        SELECT a.gid AS ga, b.gid AS gb, count(*) AS ns
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.gid < b.gid GROUP BY 1, 2)
      JOIN sizes sa ON sa.gid = ga JOIN sizes sb ON sb.gid = gb
      WHERE CAST(ns AS DOUBLE) / (sa.n_sh + sb.n_sh - ns) >= 0.05""")
    # groups whose >= 2 identical copies pair among themselves (jaccard 1)
    con.sql("""CREATE TEMP TABLE selfg AS
      SELECT g.gid FROM g JOIN sizes s ON s.gid = g.gid WHERE g.n >= 2""")
    con.sql("""CREATE TEMP TABLE members AS
      SELECT g.gid, d.doc_id FROM docs d JOIN g ON g.text = d.text""")

    # ---- q_dup_clusters: components on the GROUP graph, expanded ----
    con.sql("""CREATE TEMP TABLE comp AS
      WITH RECURSIVE
      nodes AS (SELECT ga AS gid FROM tpairs UNION SELECT gb FROM tpairs
                UNION SELECT gid FROM selfg),
      edges AS (SELECT ga AS u, gb AS v FROM tpairs
                UNION SELECT gb, ga FROM tpairs),
      reach(id, r) AS (
        SELECT gid, gid FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v)
      SELECT id AS gid, min(r) AS cmin FROM reach GROUP BY id""")
    con.sql("""CREATE TEMP VIEW dup_clusters_expected AS
      SELECT m.doc_id, c.cmin AS cluster_id
      FROM members m JOIN comp c ON c.gid = m.gid""")

    # ---- the other CC consumers, same group-level derivation (r18) ----
    # q_dedup_full: corpus minus every non-canonical cluster member
    con.sql("""CREATE TEMP VIEW dedup_full_expected AS
      SELECT d.doc_id, d.lang FROM docs d
      LEFT JOIN (SELECT m.doc_id, c.cmin FROM members m
                 JOIN comp c ON c.gid = m.gid) x ON x.doc_id = d.doc_id
      WHERE x.doc_id IS NULL OR x.cmin = d.doc_id""")
    # q_cluster_canonical: longest member per cluster (ties: min doc_id).
    # Group-level is exact: members of a group share text (same token
    # count), and the min doc_id among the longest groups' members IS
    # the min gid among those groups (gid = min member).
    con.sql("""CREATE TEMP TABLE cc_stats AS
      SELECT c.cmin AS cluster_id, g.gid, g.n AS g_n,
        len(string_split(g.text, ' ')) AS n_tokens
      FROM comp c JOIN g ON g.gid = c.gid""")
    con.sql("""CREATE TEMP VIEW cluster_canonical_expected AS
      WITH ranked AS (
        SELECT cluster_id, gid, n_tokens,
          row_number() OVER (PARTITION BY cluster_id
                             ORDER BY n_tokens DESC, gid) AS rk
        FROM cc_stats),
      sz AS (SELECT cluster_id, CAST(sum(g_n) AS BIGINT) AS n_members
             FROM cc_stats GROUP BY cluster_id)
      SELECT r.cluster_id, r.gid AS canonical_doc_id,
        CAST(r.n_tokens AS BIGINT) AS canonical_tokens, s.n_members
      FROM ranked r JOIN sz s ON s.cluster_id = r.cluster_id
      WHERE r.rk = 1""")
    # the TVF dedup-mode spelling returns (doc_id, lang) like
    # q_dedup_full — same expected relation, distinct name for clarity
    con.sql("""CREATE TEMP VIEW dedup_full_sql_expected AS
      SELECT * FROM dedup_full_expected""")
    # q_setsim_prefix (threshold 0.5): the full PPJoin PAIR LIST through
    # the clone-aware derivation — rep-level qualifying pairs expanded
    # to every member pair (inheriting the reps' exact jaccard), plus
    # every within-group member pair at jaccard exactly 1. The output
    # IS quadratic in clone-group size (the pair-list contract); the
    # derivation is 1x-sized. MATERIALIZED: ~27M rows at 100x.
    con.sql("""CREATE TEMP TABLE tp05 AS
      SELECT ga, gb,
        CAST(ns AS DOUBLE) / (sa.n_sh + sb.n_sh - ns) AS j
      FROM (
        SELECT a.gid AS ga, b.gid AS gb, count(*) AS ns
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.gid < b.gid GROUP BY 1, 2)
      JOIN sizes sa ON sa.gid = ga JOIN sizes sb ON sb.gid = gb
      WHERE CAST(ns AS DOUBLE) / (sa.n_sh + sb.n_sh - ns) >= 0.5""")
    con.sql("""CREATE TEMP VIEW setsim_prefix_expected AS
      SELECT least(ma.doc_id, mb.doc_id) AS id_a,
        greatest(ma.doc_id, mb.doc_id) AS id_b, t.j AS jaccard
      FROM tp05 t JOIN members ma ON ma.gid = t.ga
                  JOIN members mb ON mb.gid = t.gb
      UNION ALL
      SELECT a.doc_id, b.doc_id, 1.0e0
      FROM selfg s JOIN members a ON a.gid = s.gid
                   JOIN members b ON b.gid = s.gid AND a.doc_id < b.doc_id""")
    # q_containment (threshold 0.8, minShingles 5): the DIRECTED
    # containment pair list clone-aware — ordered rep-level pairs
    # (|A∩B|/|A| over group shingle sets, contained side's size gate)
    # expanded to every ordered member pair; within-group ordered pairs
    # at containment exactly 1 with n_shared = n_a = the group's
    # shingle count. MATERIALIZED: ~55M rows at 100x.
    con.sql("""CREATE TEMP TABLE ctp AS
      SELECT ga, gb, ns, sa.n_sh AS n_a,
        CAST(ns AS DOUBLE) / sa.n_sh AS c
      FROM (
        SELECT a.gid AS ga, b.gid AS gb, count(*) AS ns
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.gid <> b.gid
        GROUP BY 1, 2) x
      JOIN sizes sa ON sa.gid = ga
      WHERE sa.n_sh >= 5 AND CAST(ns AS DOUBLE) / sa.n_sh >= 0.8""")
    con.sql("""CREATE TEMP VIEW containment_expected AS
      SELECT ma.doc_id AS id_a, mb.doc_id AS id_b,
        t.ns AS n_shared, t.n_a, t.c AS containment
      FROM ctp t JOIN members ma ON ma.gid = t.ga
                 JOIN members mb ON mb.gid = t.gb
      UNION ALL
      SELECT a.doc_id, b.doc_id, s2.n_sh, s2.n_sh, 1.0e0
      FROM g gg JOIN sizes s2 ON s2.gid = gg.gid
        JOIN members a ON a.gid = gg.gid
        JOIN members b ON b.gid = gg.gid AND a.doc_id <> b.doc_id
      WHERE gg.n >= 2 AND s2.n_sh >= 5""")
    # q_ngram_jaccard (threshold 0.05): the registered query's FULL pair
    # LIST through the clone-aware derivation (r19 — the registration
    # moved onto ngramJaccardPairsCloneCollapsed): rep-level qualifying
    # pairs (tpairs, with exact jaccard) expanded to every member pair,
    # plus every within-group member pair at jaccard exactly 1. Output
    # quadratic in clone-group size (pair-list contract); derivation
    # 1x-sized. ~27M rows at 100x.
    con.sql("""CREATE TEMP VIEW ngram_jaccard_expected AS
      SELECT least(ma.doc_id, mb.doc_id) AS id_a,
        greatest(ma.doc_id, mb.doc_id) AS id_b, t.j AS jaccard
      FROM tpairs t JOIN members ma ON ma.gid = t.ga
                    JOIN members mb ON mb.gid = t.gb
      UNION ALL
      SELECT a.doc_id, b.doc_id, 1.0e0
      FROM selfg s JOIN members a ON a.gid = s.gid
                   JOIN members b ON b.gid = s.gid AND a.doc_id < b.doc_id""")
    # q_bcubed: per-doc B-cubed vs exact-dup gold, reduced group-level —
    # a clustered GROUP contributes one (cluster, group, g_n) cell
    # (every clone shares its rep's component), an unclustered group
    # one singleton cell per member. round(…, 6) absorbs the double
    # summation-order difference, as in the registered oracle.
    con.sql("""CREATE TEMP VIEW bcubed_expected AS
      WITH cells AS (
        SELECT c.cmin AS c, g.gid AS gg, CAST(g.n AS BIGINT) AS n_cg
        FROM comp c JOIN g ON g.gid = c.gid
        UNION ALL
        SELECT m.doc_id AS c, m.gid AS gg, CAST(1 AS BIGINT) AS n_cg
        FROM members m LEFT JOIN comp c ON c.gid = m.gid
        WHERE c.gid IS NULL),
      nc AS (SELECT c, sum(n_cg) AS n_c FROM cells GROUP BY c),
      ng AS (SELECT gg, sum(n_cg) AS n_g FROM cells GROUP BY gg)
      SELECT CAST(sum(n_cg) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT cells.c) AS BIGINT) AS n_pred,
        CAST(count(DISTINCT cells.gg) AS BIGINT) AS n_gold,
        round(sum(CAST(n_cg * n_cg AS DOUBLE) / n_c) / sum(n_cg), 6) AS bcubed_p,
        round(sum(CAST(n_cg * n_cg AS DOUBLE) / n_g) / sum(n_cg), 6) AS bcubed_r,
        round(sum(2.0 * n_cg * n_cg / CAST(n_c + n_g AS DOUBLE)) / sum(n_cg), 6)
          AS bcubed_f1
      FROM cells JOIN nc ON nc.c = cells.c JOIN ng ON ng.gg = cells.gg""")
    # q_leakage_safe_split: split key = cluster id (doc_id for
    # singletons), split = the engine's md5 hash-sample rule
    con.sql("""CREATE TEMP VIEW leakage_split_expected AS
      SELECT d.doc_id, coalesce(x.cmin, d.doc_id) AS split_key,
        CASE WHEN substring(md5(CAST(coalesce(x.cmin, d.doc_id) AS VARCHAR)), 1, 1) <= '1'
             THEN 'valid' ELSE 'train' END AS split
      FROM docs d
      LEFT JOIN (SELECT m.doc_id, c.cmin FROM members m
                 JOIN comp c ON c.gid = m.gid) x ON x.doc_id = d.doc_id""")

    # ---- q_label_prop: LPA on the GROUP graph, clones inherit ----
    con.sql("""CREATE TEMP TABLE edges AS
      SELECT ga AS src, gb AS dst FROM tpairs
      UNION ALL
      SELECT gb, ga FROM tpairs""")
    n_edges = con.sql("SELECT count(*) FROM edges").fetchone()[0]
    print(f"[atscale] group-level directed edges: {n_edges}")
    con.sql("CREATE TEMP TABLE l0 AS SELECT gid AS id, gid AS label FROM g")
    for r in range(1, 4):
        p = f"l{r - 1}"
        # each round MATERIALIZED (kCore-oracle discipline)
        con.sql(f"""CREATE TEMP TABLE b{r} AS
          SELECT dst, label FROM (
            SELECT dst, label,
              row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
            FROM (SELECT e.dst, p.label, count(*) AS c
                  FROM edges e JOIN {p} p ON p.id = e.src
                  GROUP BY e.dst, p.label))
          WHERE rn = 1""")
        con.sql(f"""CREATE TEMP TABLE l{r} AS
          SELECT p.id, COALESCE(b.label, p.label) AS label
          FROM {p} p LEFT JOIN b{r} b ON b.dst = p.id""")
    con.sql("""CREATE TEMP VIEW label_prop_expected AS
      SELECT m.doc_id, l3.label AS community
      FROM members m JOIN l3 ON l3.id = m.gid""")

    # every gated query is presence-checked so a partial Verify dump
    # (SPARK_GRAFT_ONLY subsets) can still be oracle'd; a FULL at-scale
    # gate should show zero SKIP lines
    ok = True
    for name, rel in [("q_dup_clusters", "dup_clusters_expected"),
                      ("q_dup_clusters_sql", "dup_clusters_expected"),
                      ("q_label_prop", "label_prop_expected"),
                      ("q_dedup_full", "dedup_full_expected"),
                      ("q_dedup_full_sql", "dedup_full_sql_expected"),
                      ("q_cluster_canonical", "cluster_canonical_expected"),
                      ("q_leakage_safe_split", "leakage_split_expected"),
                      ("q_bcubed", "bcubed_expected"),
                      ("q_setsim_prefix", "setsim_prefix_expected"),
                      ("q_ngram_jaccard", "ngram_jaccard_expected"),
                      ("q_containment", "containment_expected"),
                      # the persisted-assignment consumers (r19): stored
                      # == recomputed is spec-pinned, so each _stored twin
                      # shares its self-contained sibling's expected
                      # relation — a stale or wrong stored table fails
                      # here at scale
                      ("q_dedup_full_stored", "dedup_full_expected"),
                      ("q_cluster_canonical_stored",
                       "cluster_canonical_expected"),
                      ("q_leakage_safe_split_stored",
                       "leakage_split_expected"),
                      ("q_bcubed_stored", "bcubed_expected")]:
        if os.path.isdir(f"{out_dir}/{name}"):
            ok = compare(con, name, rel, out_dir) and ok
        else:
            print(f"SKIP {name} (not in {out_dir})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
