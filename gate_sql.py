"""DuckDB oracle-SQL builders for __spark_entry__.oracle_sql().

Every builder returns ANSI-ish SQL DuckDB executes over the driver's
pre-registered parquet views, mirroring the engine's exact semantics:
iterative operators are PROGRAMMATICALLY UNROLLED (fixed iteration counts,
MATERIALIZED CTEs so DuckDB doesn't exponentially inline the chain), and
hash-dependent operators use the portable md5 hash (linkgraph.portable)
that Spark and DuckDB compute identically.

Unroll constants are sized from measured sf0.01 doc-graph properties
(diameter 10, weighted-SSSP max dist 14, max core 4 with h-index
convergence at 6 iterations) with margin; they are verified end-to-end by
tools/check_entry.py before each round.

Builders take the shared edges CTE string as a parameter — no circular
import with __spark_entry__.
"""

from __future__ import annotations

from linkgraph.portable import phash_sql

# ---------------------------------------------------------------------------
# Distance family — unrolled frontier relaxation
# ---------------------------------------------------------------------------


def bfs_sql(cte: str, source: int = 0, hops: int = 12) -> str:
    """Single-source hop distances over the symmetrized graph."""
    parts = [f"b0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS id, 0 AS dist)"]
    for i in range(1, hops + 1):
        p = i - 1
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT id, MIN(dist) AS dist FROM ("
            f"SELECT id, dist FROM b{p} UNION ALL "
            f"SELECT e.dst AS id, b.dist + 1 FROM b{p} b JOIN sym e ON e.src = b.id"
            f") u GROUP BY id)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT id, CAST(dist AS BIGINT) AS dist FROM b{hops}"
    )


def sssp_sql(cte: str, source: int = 0, rounds: int = 16) -> str:
    """Single-source weighted distances (Bellman-Ford rounds) over sym."""
    parts = [f"s0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS id, 0.0 AS dist)"]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT id, MIN(dist) AS dist FROM ("
            f"SELECT id, dist FROM s{p} UNION ALL "
            f"SELECT e.dst AS id, s.dist + e.weight FROM s{p} s JOIN sym e ON e.src = s.id"
            f") u GROUP BY id)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT id, ROUND(dist, 6) AS dist FROM s{rounds}"
    )


def bfs_path_sql(cte: str, source: int = 0, hops: int = 12) -> str:
    """Independent replay of doc_bfs_path: hop distances (unrolled), then
    pred(v) = MIN(u) over sym neighbors with dist(u) = dist(v)-1 (exactly
    the engine's struct-min tie-break — in synchronous BFS the frontier
    at v's settling round IS the full dist(v)-1 level), then level-order
    path-string prepends."""
    parts = [f"b0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS id, 0 AS dist)"]
    for i in range(1, hops + 1):
        p = i - 1
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT id, MIN(dist) AS dist FROM ("
            f"SELECT id, dist FROM b{p} UNION ALL "
            f"SELECT e.dst AS id, b.dist + 1 FROM b{p} b JOIN sym e ON e.src = b.id"
            f") u GROUP BY id)"
        )
    parts.append(
        f"preds AS MATERIALIZED (SELECT d.id, d.dist, "
        f"(SELECT MIN(e.src) FROM sym e JOIN b{hops} s ON s.id = e.src "
        f"AND s.dist = d.dist - 1 WHERE e.dst = d.id) AS pred FROM b{hops} d)"
    )
    parts.append(
        "p0 AS MATERIALIZED (SELECT id, CAST(id AS VARCHAR) AS path "
        "FROM preds WHERE pred IS NULL)"
    )
    for i in range(1, hops + 1):
        p = i - 1
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT c.id, "
            f"p.path || '->' || CAST(c.id AS VARCHAR) AS path "
            f"FROM preds c JOIN p{p} p ON p.id = c.pred)"
        )
    pall = " UNION ALL ".join(f"SELECT id, path FROM p{i}" for i in range(hops + 1))
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f",\npall AS MATERIALIZED ({pall})\n"
        f"SELECT d.id, CAST(d.dist AS BIGINT) AS dist, d.pred, pa.path "
        f"FROM preds d JOIN pall pa ON pa.id = d.id"
    )


def _all_pairs_cte(hops: int) -> str:
    """CTE chain ap0..ap{hops}: (s, id, dist) hop distances for ALL source
    vertices at once (incl. dist 0 self rows)."""
    parts = ["ap0 AS MATERIALIZED (SELECT id AS s, id, 0 AS dist FROM nodes)"]
    for i in range(1, hops + 1):
        p = i - 1
        parts.append(
            f"ap{i} AS MATERIALIZED (SELECT s, id, MIN(dist) AS dist FROM ("
            f"SELECT s, id, dist FROM ap{p} UNION ALL "
            f"SELECT a.s, e.dst AS id, a.dist + 1 FROM ap{p} a JOIN sym e ON e.src = a.id"
            f") u GROUP BY s, id)"
        )
    return ",\n".join(parts)


def closeness_sql(cte: str, harmonic: bool, hops: int = 12) -> str:
    if harmonic:
        score = "SUM(1.0 / dist)"
    else:
        score = (
            "CAST(count(*) AS DOUBLE) * count(*) / "
            "((SELECT CAST(count(*) AS DOUBLE) - 1 FROM nodes) * SUM(dist))"
        )
    return f"""
WITH {cte},
{_all_pairs_cte(hops)},
sc AS (SELECT s, {score} AS score FROM ap{hops} WHERE dist > 0 GROUP BY s)
SELECT n.id, ROUND(COALESCE(sc.score, 0.0), 6) AS score
FROM nodes n LEFT JOIN sc ON sc.s = n.id
"""


def eccentricity_sql(cte: str, hops: int = 12) -> str:
    return f"""
WITH {cte},
{_all_pairs_cte(hops)},
ec AS (SELECT s, MAX(dist) AS ecc FROM ap{hops} GROUP BY s)
SELECT n.id, CAST(COALESCE(ec.ecc, 0) AS BIGINT) AS ecc
FROM nodes n LEFT JOIN ec ON ec.s = n.id
"""


def diameter_sql(cte: str, hops: int = 12) -> str:
    """Exact hop diameter = max pairwise finite distance (the oracle for
    the iFub implementation; valid when the graph is connected and its
    diameter ≤ hops — both hold for the doc graph at the gate SFs)."""
    return f"""
WITH {cte},
{_all_pairs_cte(hops)}
SELECT CAST(MAX(dist) AS BIGINT) AS diameter FROM ap{hops}
"""


# ---------------------------------------------------------------------------
# Power-iteration family — unrolled supersteps (directed weighted edges)
# ---------------------------------------------------------------------------


def eigenvector_sql(cte: str, iters: int = 12) -> str:
    parts = [
        "evn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "x0 AS MATERIALIZED (SELECT id, 1.0/sqrt((SELECT n FROM evn)) AS score FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"em{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(x.score * e.weight) AS m "
            f"FROM x{p} x JOIN edges e ON e.src = x.id GROUP BY e.dst)"
        )
        parts.append(
            f"er{i} AS MATERIALIZED (SELECT n.id, COALESCE(m.m, 0.0) AS m "
            f"FROM nodes n LEFT JOIN em{i} m ON m.id = n.id)"
        )
        parts.append(
            f"en{i} AS MATERIALIZED (SELECT CASE WHEN COALESCE(sqrt(SUM(m*m)), 0.0) = 0.0 "
            f"THEN 1.0 ELSE sqrt(SUM(m*m)) END AS nrm FROM er{i})"
        )
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT id, m / (SELECT nrm FROM en{i}) AS score FROM er{i})"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT id, ROUND(score, 6) AS score FROM x{iters}"
    )


def simrank_sql(cte: str, c: float = 0.8, iters: int = 3) -> str:
    """Unrolled Jeh–Widom SimRank over directed `edges`: kernel_k =
    diagonal ∪ sym(s_k), one 3-way join + pair agg per iteration —
    the same plan `linkgraph.algs.simrank.simrank` runs."""
    parts = [
        "ie AS MATERIALIZED (SELECT DISTINCT dst AS node, src AS nb FROM edges)",
        "indeg AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM ie GROUP BY node)",
        "dnodes AS MATERIALIZED (SELECT DISTINCT nb AS i FROM ie)",
        "kr0 AS MATERIALIZED (SELECT i, i AS j, 1.0 AS s FROM dnodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"sr{i} AS MATERIALIZED ("
            f"SELECT a.node AS u, b.node AS v, "
            f"{c!r} * SUM(k.s) / (da.d * db.d) AS s "
            f"FROM ie a JOIN kr{p} k ON a.nb = k.i "
            f"JOIN ie b ON b.nb = k.j "
            f"JOIN indeg da ON da.node = a.node "
            f"JOIN indeg db ON db.node = b.node "
            f"WHERE a.node < b.node "
            f"GROUP BY a.node, b.node, da.d, db.d)"
        )
        if i < iters:
            parts.append(
                f"kr{i} AS MATERIALIZED ("
                f"SELECT i, i AS j, 1.0 AS s FROM dnodes "
                f"UNION ALL SELECT u AS i, v AS j, s FROM sr{i} "
                f"UNION ALL SELECT v AS i, u AS j, s FROM sr{i})"
            )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT u, v, ROUND(s, 6) AS sim FROM sr{iters}"
    )


def katz_sql(cte: str, alpha: float, beta: float, iters: int = 12) -> str:
    parts = [f"k0 AS MATERIALIZED (SELECT id, {beta!r} AS score FROM nodes)"]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"km{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(x.score * e.weight) AS m "
            f"FROM k{p} x JOIN edges e ON e.src = x.id GROUP BY e.dst)"
        )
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT n.id, {alpha!r} * COALESCE(m.m, 0.0) + {beta!r} AS score "
            f"FROM nodes n LEFT JOIN km{i} m ON m.id = n.id)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT id, ROUND(score, 6) AS score FROM k{iters}"
    )


# ---------------------------------------------------------------------------
# k-core via unrolled h-index fixpoint (Lü et al. 2016: converges to core)
# ---------------------------------------------------------------------------


def kcore_sql(cte: str, iters: int = 10) -> str:
    parts = [
        "symn AS MATERIALIZED (SELECT src, dst FROM sym WHERE src <> dst)",
        "hc0 AS MATERIALIZED (SELECT n.id, COALESCE(d.v, 0) AS v FROM nodes n "
        "LEFT JOIN (SELECT src AS id, count(*) AS v FROM symn GROUP BY src) d ON d.id = n.id)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"hc{i} AS MATERIALIZED (SELECT n.id, COALESCE(h.hv, 0) AS v FROM nodes n LEFT JOIN ("
            f"SELECT src AS id, MAX(LEAST(v, rn)) AS hv FROM ("
            f"SELECT e.src AS src, p.v, ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY p.v DESC) AS rn "
            f"FROM symn e JOIN hc{p} p ON p.id = e.dst) t GROUP BY src) h ON h.id = n.id)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT id, CAST(v AS BIGINT) AS core FROM hc{iters}"
    )


# ---------------------------------------------------------------------------
# SCC via transitive closure (fixture-scale oracle)
# ---------------------------------------------------------------------------


def scc_sql(cte: str) -> str:
    return f"""
WITH RECURSIVE {cte},
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
mutual AS (
  SELECT a.src AS u, a.dst AS v FROM reach a
  JOIN reach b ON b.src = a.dst AND b.dst = a.src
)
SELECT n.id, LEAST(n.id, COALESCE(MIN(m.u), n.id)) AS component
FROM nodes n LEFT JOIN mutual m ON m.v = n.id GROUP BY n.id
"""


# ---------------------------------------------------------------------------
# Minimum spanning forest — Kruskal counting identity
# ---------------------------------------------------------------------------


def spanning_stats_sql(cte: str, weights: tuple = (1, 2, 3, 4, 5)) -> str:
    """MSF (edge count, total weight) WITHOUT computing a forest: edges of
    weight exactly t in any MSF = c_{<=t-1} - c_{<=t}, where c_{<=x} is the
    component count of the subgraph restricted to weight <= x (Kruskal
    exchange argument — the MSF weight multiset is unique even under
    ties)."""
    parts = []
    for t in weights:
        parts.append(
            f"st{t}(id, label) AS (SELECT id, id FROM nodes UNION "
            f"SELECT e.dst, r.label FROM st{t} r JOIN sym e ON e.src = r.id "
            f"AND e.weight <= {t} WHERE r.label < e.dst)"
        )
        parts.append(
            f"c{t} AS (SELECT count(DISTINCT label) AS c FROM "
            f"(SELECT id, MIN(label) AS label FROM st{t} GROUP BY id) z)"
        )
    terms = []
    prev = "(SELECT count(*) FROM nodes)"
    for t in weights:
        terms.append(f"{float(t)} * ({prev} - (SELECT c FROM c{t}))")
        prev = f"(SELECT c FROM c{t})"
    last = weights[-1]
    return (
        f"WITH RECURSIVE {cte},\n" + ",\n".join(parts) + "\n"
        f"SELECT CAST((SELECT count(*) FROM nodes) - (SELECT c FROM c{last}) AS BIGINT) AS n_edges,\n"
        f"ROUND({' + '.join(terms)}, 6) AS total_weight"
    )


# ---------------------------------------------------------------------------
# PLP — unrolled synchronous label propagation with the portable tie hash
# ---------------------------------------------------------------------------


def _plp_chain(px: str, iters: int) -> list[str]:
    """Synchronous-PLP replay chain over pre-existing CTEs ``{px}symn``
    (src, dst, weight — no self-loops) and ``{px}nodes`` (id); emits
    labels {px}l0 .. {px}l{iters} (algs/plp.py::label_propagation with
    tie_hash='portable', expression by expression): per-(id,label)
    stationary tie hash, parity-gated move application (fresh gate hash
    per round; blocked moves defer to a later round's gate)."""
    parts = [
        f"{px}l0 AS MATERIALIZED (SELECT id, id AS label FROM {px}nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        tie = phash_sql("v.id", "v.label")
        gate = phash_sql("j.id", str(i - 1))  # step() receives k = i-1
        parts.append(
            f"{px}v{i} AS MATERIALIZED (SELECT e.dst AS id, l.label, SUM(e.weight) AS w "
            f"FROM {px}l{p} l JOIN {px}symn e ON e.src = l.id GROUP BY e.dst, l.label)"
        )
        parts.append(
            f"{px}b{i} AS MATERIALIZED (SELECT id, label FROM ("
            f"SELECT v.id, v.label, ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY "
            f"v.w DESC, (CASE WHEN v.label = c.label THEN 1 ELSE 0 END) DESC, "
            f"{tie} ASC, v.label ASC) AS rn "
            f"FROM {px}v{i} v JOIN {px}l{p} c ON c.id = v.id) z WHERE rn = 1)"
        )
        parts.append(
            f"{px}l{i} AS MATERIALIZED (SELECT j.id, "
            f"CASE WHEN j.win <> j.old AND {gate} % 2 = 0 THEN j.win "
            f"ELSE j.old END AS label FROM ("
            f"SELECT n.id, c.label AS old, COALESCE(b.label, c.label) AS win "
            f"FROM {px}nodes n JOIN {px}l{p} c ON c.id = n.id"
            f" LEFT JOIN {px}b{i} b ON b.id = n.id) j)"
        )
    return parts


def plp_sql(cte: str, iters: int = 30) -> str:
    parts = [
        "symn AS MATERIALIZED (SELECT src, dst, weight FROM sym WHERE src <> dst)",
        "nodes2 AS MATERIALIZED (SELECT id FROM nodes)",
    ]
    chain = _plp_chain("", iters)
    # the un-prefixed chain expects "nodes"; the shared cte already defines
    # it, so just rebind symn and reuse the chain directly
    parts += [c.replace("FROM nodes n", "FROM nodes2 n") for c in chain]
    body = ",\n".join(parts)
    return f"""
WITH {cte},
{body},
canon AS (SELECT label, MIN(id) AS cl FROM l{iters} GROUP BY label)
SELECT l.id, c.cl AS label FROM l{iters} l JOIN canon c ON c.label = l.label
"""


# ---------------------------------------------------------------------------
# ANF — portable FM sketches, h hops
# ---------------------------------------------------------------------------


def anf_sql(cte: str, hops: int = 2, registers: int = 8) -> str:
    h = phash_sql("q.id", "q.r")
    parts = [
        f"regs AS MATERIALIZED (SELECT r FROM generate_series(0, {registers - 1}) t(r))",
        f"fmh AS MATERIALIZED (SELECT q.id, q.r, {h} AS h "
        f"FROM (SELECT n.id, g.r FROM nodes n CROSS JOIN regs g) q)",
        "fm0 AS MATERIALIZED (SELECT id, r, "
        "(CAST(1 AS BIGINT) << CAST(LEAST(bit_count((h & -h) - 1), 62) AS INT)) AS bits "
        "FROM fmh)",
    ]
    for i in range(1, hops + 1):
        p = i - 1
        parts.append(
            f"fm{i} AS MATERIALIZED (SELECT id, r, bit_or(bits) AS bits FROM ("
            f"SELECT id, r, bits FROM fm{p} UNION ALL "
            f"SELECT e.dst AS id, i.r, i.bits FROM fm{p} i JOIN sym e ON e.src = i.id"
            f") u GROUP BY id, r)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) + f""",
fme AS (SELECT id, AVG(CAST(bit_count(((bits + 1) & ~bits) - 1) AS DOUBLE)) AS bbar
        FROM fm{hops} GROUP BY id)
SELECT id, ROUND(pow(2.0, bbar) / 0.77351, 3) AS est FROM fme
"""
    )


# ---------------------------------------------------------------------------
# MinHash / SimHash — portable signatures over the documents table
# ---------------------------------------------------------------------------

_SHINGLE_CTE = """
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
shg AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh
  FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
)"""


def _minhash_cte(num_hashes: int, bands: int, threshold: float) -> str:
    rpb = num_hashes // bands
    mins = ", ".join(
        f"MIN({phash_sql('sh', str(h))}) AS m{h}" for h in range(num_hashes)
    )
    band_rows = []
    for b in range(bands):
        concat = " || ',' || ".join(
            f"CAST(m{b * rpb + r} AS VARCHAR)" for r in range(rpb)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band, {phash_sql(concat, str(b))} AS bh FROM sg"
        )
    agree = " + ".join(
        f"(CASE WHEN sa.m{h} = sb.m{h} THEN 1 ELSE 0 END)" for h in range(num_hashes)
    )
    return f"""
{_SHINGLE_CTE},
sg AS MATERIALIZED (SELECT doc_id, {mins} FROM shg GROUP BY doc_id),
bd AS MATERIALIZED ({' UNION ALL '.join(band_rows)}),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bd x JOIN bd y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
),
est AS MATERIALIZED (
  SELECT c.a, c.b, ({agree}) / {float(num_hashes)} AS est_jaccard
  FROM cand c JOIN sg sa ON sa.doc_id = c.a JOIN sg sb ON sb.doc_id = c.b
),
hits AS (SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= {threshold!r})"""


def minhash_pairs_sql(num_hashes: int = 64, bands: int = 16, threshold: float = 0.7) -> str:
    return f"WITH {_minhash_cte(num_hashes, bands, threshold)}\nSELECT a, b, est_jaccard FROM hits"


def minhash_groups_sql(num_hashes: int = 64, bands: int = 16, threshold: float = 0.7) -> str:
    return f"""
WITH RECURSIVE {_minhash_cte(num_hashes, bands, threshold)},
pe AS MATERIALIZED (SELECT a AS src, b AS dst FROM hits UNION SELECT b, a FROM hits),
gr(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT p.dst, g.label FROM gr g JOIN pe p ON p.src = g.id WHERE g.label < p.dst
)
SELECT d.doc_id, MIN(g.label) AS group_id,
       CAST(CASE WHEN MIN(g.label) = d.doc_id THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM documents d JOIN gr g ON g.id = d.doc_id GROUP BY d.doc_id
"""


def simhash_sql(max_hamming: int = 3) -> str:
    th = phash_sql("t")
    bit_sums = ", ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN f ELSE -f END) AS b{i}"
        for i in range(60)
    )
    sig = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END)"
        for i in range(60)
    )
    chunk_rows = " UNION ALL ".join(
        f"SELECT doc_id, {c} AS chunk, (simhash >> {16 * c}) & 65535 AS cv FROM sig"
        for c in range(4)
    )
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, t, count(*) AS f, {th} AS h FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
  ) z GROUP BY doc_id, t
),
bs AS MATERIALIZED (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id),
sig AS MATERIALIZED (SELECT doc_id, {sig} AS simhash FROM bs),
ch AS MATERIALIZED ({chunk_rows}),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM ch x JOIN ch y ON x.chunk = y.chunk AND x.cv = y.cv AND x.doc_id < y.doc_id
)
SELECT c.a, c.b, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Extraction — independent DuckDB re-implementation of pages → edges
# ---------------------------------------------------------------------------


def page_content_sql(pages_glob: str) -> str:
    """Boilerplate removal replay: the same block segmentation, cleaning
    and word/anchor-word counters as linkgraph.text.boilerplate (regexes
    imported from the module — Java∩RE2 subset), re-expressed as DuckDB
    list lambdas. Defaults: min_words=5, max_link_density=0.5."""
    from linkgraph.text.boilerplate import ANCHOR_TEXT_RE, BLOCK_SPLIT_RE

    def clean(x: str) -> str:
        return (
            "trim(regexp_replace(regexp_replace("
            + x
            + ", '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))"
        )

    def wc(y: str) -> str:
        return f"len(list_filter(string_split({y}, ' '), w -> w <> ''))"

    # COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — both joins below normalize to ''
    anchor = (
        "COALESCE(array_to_string("
        f"regexp_extract_all(x, '{ANCHOR_TEXT_RE}', 1), ' '), '')"
    )
    return f"""
WITH p AS (SELECT url, decode(html) AS h FROM read_parquet('{pages_glob}')),
b AS (SELECT url, string_split_regex(h, '{BLOCK_SPLIT_RE}') AS blocks FROM p),
st AS (SELECT url, list_transform(blocks, x -> struct_pack(
         txt := {clean('x')},
         n := {wc(clean('x'))},
         nl := {wc(clean(anchor))})) AS stats FROM b),
ne AS (SELECT url, list_filter(stats, s -> s.n > 0) AS ne FROM st),
kp AS (SELECT url, ne,
              list_filter(ne, s -> s.n >= 5
                          AND CAST(s.nl AS DOUBLE) <= 0.5 * s.n) AS kept
       FROM ne),
agg AS (SELECT url,
               COALESCE(array_to_string(list_transform(kept, s -> s.txt), ' '), '')
                 AS content,
               len(ne) AS n_blocks, len(kept) AS n_kept,
               CAST(COALESCE(list_sum(list_transform(ne, s -> s.n)), 0) AS BIGINT)
                 AS total_words,
               CAST(COALESCE(list_sum(list_transform(kept, s -> s.n)), 0) AS BIGINT)
                 AS kept_words
        FROM kp)
SELECT url, content, n_blocks, n_kept, total_words, kept_words,
       ROUND(CASE WHEN total_words > 0
             THEN CAST(total_words - kept_words AS DOUBLE) / total_words
             ELSE 0.0 END, 6) AS boilerplate_frac
FROM agg
"""


def extraction_edges_sql(pages_glob: str) -> str:
    """Href extraction + url normalization + dense dictionary encoding +
    (src, dst, weight) aggregation, written INDEPENDENTLY in DuckDB SQL
    (regexp ops) against the committed deterministic pages fixture — an
    end-to-end extraction parity check with no shared code."""
    return (
        "WITH "
        + _extraction_cte(pages_glob)
        + """
SELECT ds.id AS src, dd.id AS dst, CAST(count(*) AS DOUBLE) AS weight
FROM trimmed t
JOIN dict dd ON dd.url = t.dst_url
JOIN dict ds ON ds.url = t.url
GROUP BY ds.id, dd.id
"""
    )


def extraction_edges_url_sql(pages_glob: str) -> str:
    """Same independent extraction replay, keyed by URL instead of dense
    id — the oracle for the end-to-end STREAMING pipeline (whose edge ids
    are hash-based; urls are the stable cross-engine key)."""
    return (
        "WITH "
        + _extraction_cte(pages_glob)
        + """
SELECT t.url AS src_url, t.dst_url, CAST(count(*) AS DOUBLE) AS weight
FROM trimmed t
JOIN dict dd ON dd.url = t.dst_url
GROUP BY t.url, t.dst_url
"""
    )


_HOST_RE = "'^https?://([^/:?#]+)'"


def _host_links_cte(pages_glob: str) -> str:
    """Extraction replay + host parsing: hl(src_host, dst_host), one row
    per resolved link whose both endpoints parse to a host (dangling
    targets KEPT — the host graph keeps out-of-crawl structure)."""
    return (
        _extraction_cte(pages_glob)
        + f""",
hl AS MATERIALIZED (
  SELECT regexp_extract(lower(url), {_HOST_RE}, 1) AS src_host,
         regexp_extract(lower(dst_url), {_HOST_RE}, 1) AS dst_host
  FROM trimmed
  WHERE regexp_extract(lower(url), {_HOST_RE}, 1) <> ''
    AND regexp_extract(lower(dst_url), {_HOST_RE}, 1) <> ''
)"""
    )


def host_edges_sql(pages_glob: str) -> str:
    """Contracted host-graph weighted edge list (intra-host links
    dropped), independently re-derived in DuckDB regexp SQL."""
    return (
        "WITH "
        + _host_links_cte(pages_glob)
        + """
SELECT src_host, dst_host, CAST(count(*) AS DOUBLE) AS weight
FROM hl WHERE src_host <> dst_host
GROUP BY src_host, dst_host
"""
    )


def host_stats_sql(pages_glob: str) -> str:
    """Per-host crawl stats replay: pages per host + out-link split."""
    return (
        "WITH "
        + _host_links_cte(pages_glob)
        + f""",
hp AS (SELECT regexp_extract(lower(url), {_HOST_RE}, 1) AS host FROM pages
       WHERE regexp_extract(lower(url), {_HOST_RE}, 1) <> ''),
np AS (SELECT host, count(*) AS n_pages FROM hp GROUP BY host),
outs AS (
  SELECT src_host AS host, count(*) AS out_links,
         CAST(SUM(CASE WHEN src_host = dst_host THEN 1 ELSE 0 END) AS BIGINT)
           AS intra_links,
         count(DISTINCT CASE WHEN dst_host <> src_host THEN dst_host END)
           AS n_dst_hosts
  FROM hl GROUP BY src_host
)
SELECT np.host, np.n_pages,
       COALESCE(outs.out_links, 0) AS out_links,
       COALESCE(outs.intra_links, 0) AS intra_links,
       COALESCE(outs.n_dst_hosts, 0) AS n_dst_hosts
FROM np LEFT JOIN outs ON outs.host = np.host
"""
    )


def host_graph_cte(pages_glob: str) -> str:
    """edges(src, dst) / nodes(id) over host STRINGS (one unweighted edge
    per linked host pair, intra dropped) — the prefix the unrolled
    PageRank generator runs on for host rank."""
    return (
        _host_links_cte(pages_glob)
        + """,
edges AS MATERIALIZED (
  SELECT src_host AS src, dst_host AS dst FROM hl
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
),
nodes AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM edges UNION SELECT dst FROM edges
)"""
    )


def anchor_text_sql(pages_glob: str) -> str:
    """Anchor-text table replay, written independently in DuckDB regexp
    SQL: full <a ...>...</a> elements via regexp_extract_all(group 0),
    href + tag-stripped/ws-collapsed inner text via per-tag
    regexp_extract, the SAME url normalization rules as the extraction
    oracle, dangling targets kept, one (dst_url, anchor) aggregation."""
    base_re = "'^(https?://[^/]+)(/.*)?$'"

    def _norm(u: str) -> str:
        return f"""CASE
    WHEN {u} = '' THEN NULL
    WHEN {u} LIKE 'http://%' OR {u} LIKE 'https://%' THEN {u}
    WHEN regexp_extract(url, {base_re}, 1) = '' THEN NULL
    WHEN {u} LIKE '/%' THEN regexp_extract(url, {base_re}, 1) || {u}
    ELSE regexp_extract(url, {base_re}, 1) ||
         regexp_replace(CASE WHEN COALESCE(regexp_extract(url, {base_re}, 2), '') = ''
                        THEN '/' ELSE regexp_extract(url, {base_re}, 2) END,
                        '/[^/]*$', '') || '/' || {u}
  END"""

    return f"""
WITH pages AS MATERIALIZED (
  SELECT url, decode(html) AS html FROM read_parquet('{pages_glob}')
),
tags AS MATERIALIZED (
  SELECT url,
         UNNEST(regexp_extract_all(html, '(?is)<a\\s+href="[^"]*"[^>]*>.*?</a>', 0)) AS tag
  FROM pages
),
pr AS (
  SELECT url,
         split_part(split_part(
           regexp_extract(tag, '(?is)<a\\s+href="([^"]*)"', 1), '#', 1), '?', 1) AS u,
         trim(regexp_replace(regexp_replace(
           regexp_extract(tag, '(?is)<a\\s+href="[^"]*"[^>]*>(.*)</a>', 1),
           '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) AS anchor
  FROM tags
),
norm AS (
  SELECT url, anchor, {_norm('u')} AS out0 FROM pr
),
resolved AS (
  SELECT CASE WHEN length(out0) > 8 AND out0 LIKE '%/'
              THEN rtrim(out0, '/') ELSE out0 END AS dst_url,
         anchor, url
  FROM norm WHERE out0 IS NOT NULL
)
SELECT dst_url, anchor, count(*) AS n_refs,
       count(DISTINCT url) AS n_src_pages
FROM resolved GROUP BY dst_url, anchor
"""


def _extraction_cte(pages_glob: str) -> str:
    return f"""pages AS MATERIALIZED (
  SELECT url, decode(html) AS html FROM read_parquet('{pages_glob}')
),
hrefs AS MATERIALIZED (
  SELECT url, UNNEST(regexp_extract_all(html, '<a\\s+href="([^"]*)"', 1)) AS href
  FROM pages
),
stripped AS (
  SELECT url, split_part(split_part(href, '#', 1), '?', 1) AS u FROM hrefs
),
norm AS MATERIALIZED (
  SELECT url, CASE
    WHEN u = '' THEN NULL
    WHEN u LIKE 'http://%' OR u LIKE 'https://%' THEN u
    WHEN regexp_extract(url, '^(https?://[^/]+)(/.*)?$', 1) = '' THEN NULL
    WHEN u LIKE '/%' THEN regexp_extract(url, '^(https?://[^/]+)(/.*)?$', 1) || u
    ELSE regexp_extract(url, '^(https?://[^/]+)(/.*)?$', 1) ||
         regexp_replace(CASE WHEN COALESCE(regexp_extract(url, '^(https?://[^/]+)(/.*)?$', 2), '') = ''
                        THEN '/' ELSE regexp_extract(url, '^(https?://[^/]+)(/.*)?$', 2) END,
                        '/[^/]*$', '') || '/' || u
  END AS out0
  FROM stripped
),
trimmed AS (
  SELECT url, CASE WHEN length(out0) > 8 AND out0 LIKE '%/'
              THEN rtrim(out0, '/') ELSE out0 END AS dst_url
  FROM norm WHERE out0 IS NOT NULL
),
dict AS MATERIALIZED (
  SELECT url, ROW_NUMBER() OVER (ORDER BY url) - 1 AS id
  FROM (SELECT DISTINCT url FROM pages) d
)"""


# ---------------------------------------------------------------------------
# Partition-quality metrics over the FIXED labeling label = id % 7
# (fixed labels make the aggregations oracle-checkable; engine-produced
# labelings are covered by their own oracles)
# ---------------------------------------------------------------------------

_LABELED = """
lab AS (SELECT id, id % 7 AS label FROM nodes),
le AS MATERIALIZED (
  SELECT s.src, s.dst, s.weight, ls.label AS sl, ld.label AS dl
  FROM sym s JOIN lab ls ON ls.id = s.src JOIN lab ld ON ld.id = s.dst
)"""


def hub_dominance_sql(cte: str) -> str:
    return f"""
WITH {cte},
{_LABELED},
idm AS (SELECT src AS id, sl AS label, count(*) AS d FROM le WHERE sl = dl GROUP BY src, sl),
mx AS (SELECT label, MAX(d) AS max_d FROM idm GROUP BY label),
sz AS (SELECT label, count(*) AS size FROM lab GROUP BY label)
SELECT sz.label, ROUND(CASE WHEN sz.size > 1
  THEN CAST(COALESCE(mx.max_d, 0) AS DOUBLE) / (sz.size - 1) ELSE 0.0 END, 6) AS hub_dominance
FROM sz LEFT JOIN mx ON mx.label = sz.label
"""


def conductance_sql(cte: str) -> str:
    return f"""
WITH {cte},
{_LABELED},
tw AS (SELECT SUM(weight) AS two_w FROM le),
per AS (
  SELECT sl AS label, SUM(weight) AS vol,
         SUM(CASE WHEN sl <> dl THEN weight ELSE 0.0 END) AS cut_w
  FROM le GROUP BY sl
),
sz AS (SELECT label, count(*) AS size FROM lab GROUP BY label)
SELECT sz.label,
  ROUND(CASE WHEN LEAST(COALESCE(per.vol, 0.0), (SELECT two_w FROM tw) - COALESCE(per.vol, 0.0)) > 0
        THEN COALESCE(per.cut_w, 0.0) / LEAST(per.vol, (SELECT two_w FROM tw) - per.vol)
        ELSE 0.0 END, 6) AS conductance
FROM sz LEFT JOIN per ON per.label = sz.label
"""


def stable_nodes_sql(cte: str) -> str:
    return f"""
WITH {cte},
{_LABELED},
per AS (
  SELECT src AS id, SUM(weight) AS wdeg,
         SUM(CASE WHEN sl = dl THEN weight ELSE 0.0 END) AS w_in
  FROM le GROUP BY src
)
SELECT n.id, CASE WHEN COALESCE(per.wdeg, 0.0) = 0.0 THEN TRUE
            ELSE per.w_in >= 0.5 * per.wdeg END AS stable
FROM nodes n LEFT JOIN per ON per.id = n.id
"""


def fragmentation_sql(cte: str) -> str:
    return f"""
WITH RECURSIVE {cte},
{_LABELED},
intra AS MATERIALIZED (SELECT src, dst FROM le WHERE sl = dl),
fr(id, blk) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT i.dst, r.blk FROM fr r JOIN intra i ON i.src = r.id WHERE r.blk < i.dst
),
blocks AS (SELECT id, MIN(blk) AS blk FROM fr GROUP BY id),
bs AS (SELECT l.label, b.blk, count(*) AS n FROM lab l JOIN blocks b ON b.id = l.id GROUP BY l.label, b.blk),
lg AS (SELECT label, MAX(n) AS largest FROM bs GROUP BY label),
sz AS (SELECT label, count(*) AS size FROM lab GROUP BY label)
SELECT sz.label, ROUND(1.0 - CAST(lg.largest AS DOUBLE) / sz.size, 6) AS fragmentation
FROM sz JOIN lg ON lg.label = sz.label
"""


# ---------------------------------------------------------------------------
# Link-prediction additions
# ---------------------------------------------------------------------------

_LP_CTE = """
symn AS (SELECT src, dst FROM sym WHERE src <> dst),
wedge AS (
  SELECT e1.src AS u, e2.src AS v, e1.dst AS w
  FROM symn e1 JOIN symn e2 ON e1.dst = e2.dst AND e1.src < e2.src
),
deg AS (SELECT src AS id, count(*) AS d FROM symn GROUP BY src),
cn AS (SELECT u, v, count(*) AS c FROM wedge GROUP BY u, v)"""


def total_neighbors_sql(cte: str) -> str:
    return f"""
WITH {cte},
{_LP_CTE}
SELECT cn.u, cn.v, CAST(du.d + dv.d - cn.c AS DOUBLE) AS score
FROM cn JOIN deg du ON du.id = cn.u JOIN deg dv ON dv.id = cn.v
"""


def neighborhood_distance_sql(cte: str) -> str:
    return f"""
WITH {cte},
{_LP_CTE}
SELECT cn.u, cn.v, ROUND(cn.c / sqrt(CAST(du.d AS DOUBLE) * dv.d), 6) AS score
FROM cn JOIN deg du ON du.id = cn.u JOIN deg dv ON dv.id = cn.v
"""


def katz_index_sql(cte: str, beta: float, max_length: int = 3) -> str:
    parts = [
        "symn AS MATERIALIZED (SELECT src, dst FROM sym WHERE src <> dst)",
        "p1 AS MATERIALIZED (SELECT src, dst, 1.0 AS cnt FROM symn)",
    ]
    for length in range(2, max_length + 1):
        p = length - 1
        parts.append(
            f"p{length} AS MATERIALIZED (SELECT p.src, e.dst, SUM(p.cnt) AS cnt "
            f"FROM p{p} p JOIN symn e ON e.src = p.dst GROUP BY p.src, e.dst)"
        )
    unions = " UNION ALL ".join(
        f"SELECT src, dst, POWER({beta!r}, {k}) * cnt AS s FROM p{k}"
        for k in range(1, max_length + 1)
    )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) + f""",
allp AS ({unions})
SELECT src AS u, dst AS v, ROUND(SUM(s), 9) AS score FROM allp
WHERE src < dst GROUP BY src, dst
"""
    )


# ---------------------------------------------------------------------------
# Edge scores
# ---------------------------------------------------------------------------


def prefix_jaccard_sql(cte: str, k: int = 5) -> str:
    return f"""
WITH {cte},
nbrs AS MATERIALIZED (SELECT DISTINCT src AS id, dst AS nbr FROM sym WHERE src <> dst),
dg AS (SELECT id, count(*) AS degree FROM nbrs GROUP BY id),
ranked AS MATERIALIZED (
  SELECT n.id, n.nbr,
         ROW_NUMBER() OVER (PARTITION BY n.id ORDER BY d.degree DESC, n.nbr ASC) AS rn
  FROM nbrs n JOIN dg d ON d.id = n.nbr
),
prefix AS MATERIALIZED (SELECT id, nbr FROM ranked WHERE rn <= {k}),
canon AS (SELECT DISTINCT src, dst FROM sym WHERE src < dst),
inter AS (
  SELECT c.src, c.dst, count(*) AS i
  FROM canon c JOIN prefix pu ON pu.id = c.src JOIN prefix pv ON pv.id = c.dst
  WHERE pu.nbr = pv.nbr GROUP BY c.src, c.dst
),
szs AS (SELECT id, count(*) AS sz FROM prefix GROUP BY id)
SELECT c.src, c.dst,
  ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) / (su.sz + sv.sz - COALESCE(i.i, 0)), 6) AS score
FROM canon c LEFT JOIN inter i ON i.src = c.src AND i.dst = c.dst
JOIN szs su ON su.id = c.src JOIN szs sv ON sv.id = c.dst
"""


def simmelian_sql(cte: str, max_rank: int = 10) -> str:
    tri_cte = """
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst),
tri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tedges AS (
  SELECT x AS u, y AS v FROM tri UNION ALL SELECT x, z FROM tri UNION ALL SELECT y, z FROM tri
),
tcnt AS (SELECT u AS src, v AS dst, count(*) AS triangles FROM tedges GROUP BY u, v),
canon AS MATERIALIZED (
  SELECT s.src, s.dst, COALESCE(t.triangles, 0) AS triangles
  FROM (SELECT DISTINCT src, dst FROM sym WHERE src < dst) s
  LEFT JOIN tcnt t ON t.src = s.src AND t.dst = s.dst
)"""
    return f"""
WITH {cte},
{tri_cte},
directed AS (
  SELECT src AS id, dst AS nbr, triangles FROM canon
  UNION ALL SELECT dst, src, triangles FROM canon
),
ranked AS MATERIALIZED (
  SELECT id, nbr,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY triangles DESC, nbr ASC) AS rn
  FROM directed
),
prefix AS MATERIALIZED (SELECT id, nbr FROM ranked WHERE rn <= {max_rank}),
inter AS (
  SELECT c.src, c.dst, count(*) AS i
  FROM canon c JOIN prefix pu ON pu.id = c.src JOIN prefix pv ON pv.id = c.dst
  WHERE pu.nbr = pv.nbr GROUP BY c.src, c.dst
)
SELECT c.src, c.dst, CAST(COALESCE(i.i, 0) AS DOUBLE) AS score
FROM canon c LEFT JOIN inter i ON i.src = c.src AND i.dst = c.dst
"""


_CANON_TRI = """
ce AS MATERIALIZED (SELECT src, dst, weight FROM sym WHERE src < dst),
cn AS MATERIALIZED (
  SELECT a.src AS u, b.src AS v, count(*) AS t
  FROM sym a JOIN sym b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src
),
deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)"""


def sfigality_sql(cte: str) -> str:
    """Per-vertex fraction of neighbors with strictly higher degree."""
    return f"""
WITH {cte},
deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src),
per AS (
  SELECT s.src AS id,
         CAST(SUM(CASE WHEN dd.d > ds.d THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS score
  FROM sym s JOIN deg ds ON ds.id = s.src JOIN deg dd ON dd.id = s.dst
  GROUP BY s.src
)
SELECT n.id, ROUND(COALESCE(per.score, 0.0), 6) AS score
FROM nodes n LEFT JOIN per ON per.id = n.id
"""


def local_similarity_sql(cte: str) -> str:
    """Per-edge Jaccard of open neighborhoods: T/(du+dv-T-2)."""
    return f"""
WITH {cte},
{_CANON_TRI}
SELECT ce.src, ce.dst,
  ROUND(CASE WHEN du.d + dv.d - COALESCE(cn.t, 0) - 2 > 0
        THEN CAST(COALESCE(cn.t, 0) AS DOUBLE) / (du.d + dv.d - COALESCE(cn.t, 0) - 2)
        ELSE 0.0 END, 6) AS score
FROM ce JOIN deg du ON du.id = ce.src JOIN deg dv ON dv.id = ce.dst
LEFT JOIN cn ON cn.u = ce.src AND cn.v = ce.dst
"""


def scan_similarity_sql(cte: str) -> str:
    """SCAN structural similarity with closed neighborhoods."""
    return f"""
WITH {cte},
{_CANON_TRI}
SELECT ce.src, ce.dst,
  ROUND((COALESCE(cn.t, 0) + 2) / SQRT((du.d + 1.0) * (dv.d + 1.0)), 6) AS score
FROM ce JOIN deg du ON du.id = ce.src JOIN deg dv ON dv.id = ce.dst
LEFT JOIN cn ON cn.u = ce.src AND cn.v = ce.dst
"""


def multiscale_sql(cte: str) -> str:
    """Disparity-filter significance, max over endpoints."""
    return f"""
WITH {cte},
st AS (SELECT src AS id, count(*) AS k, SUM(weight) AS s FROM sym GROUP BY src),
ce AS (SELECT src, dst, weight FROM sym WHERE src < dst)
SELECT ce.src, ce.dst, ROUND(GREATEST(
  CASE WHEN su.k <= 1 THEN 1.0
       ELSE 1.0 - POWER(1.0 - LEAST(ce.weight / su.s, 1.0), su.k - 1) END,
  CASE WHEN sv.k <= 1 THEN 1.0
       ELSE 1.0 - POWER(1.0 - LEAST(ce.weight / sv.s, 1.0), sv.k - 1) END
), 6) AS score
FROM ce JOIN st su ON su.id = ce.src JOIN st sv ON sv.id = ce.dst
"""


def local_coverage_sql(cte: str) -> str:
    """Per-vertex fraction of incident weight staying in its id%7 part."""
    return f"""
WITH {cte},
{_LABELED},
per AS (
  SELECT src AS id,
         SUM(CASE WHEN sl = dl THEN weight ELSE 0.0 END) / SUM(weight) AS cov
  FROM le GROUP BY src
)
SELECT n.id, ROUND(COALESCE(per.cov, 0.0), 6) AS coverage
FROM nodes n LEFT JOIN per ON per.id = n.id
"""


def permanence_sql(cte: str) -> str:
    """Per-vertex permanence vs the fixed id%7 labeling."""
    return f"""
WITH {cte},
{_LABELED},
per AS (
  SELECT src AS id, count(*) AS deg,
         SUM(CASE WHEN sl = dl THEN 1 ELSE 0 END) AS internal
  FROM le GROUP BY src
),
emax AS (
  SELECT src AS id, MAX(c) AS emax FROM (
    SELECT src, dl, count(*) AS c FROM le WHERE sl <> dl GROUP BY src, dl
  ) z GROUP BY src
),
iund AS MATERIALIZED (SELECT src AS a, dst AS b FROM le WHERE sl = dl AND src < dst),
itri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM iund e1 JOIN iund e2 ON e2.a = e1.b
         JOIN iund e3 ON e3.a = e1.a AND e3.b = e2.b),
icorn AS (
  SELECT x AS id FROM itri UNION ALL SELECT y FROM itri UNION ALL SELECT z FROM itri
),
itc AS (SELECT id, count(*) AS tri FROM icorn GROUP BY id),
sc AS (
  SELECT p.id,
    CASE WHEN p.deg > 0 THEN
      CAST(p.internal AS DOUBLE) / (GREATEST(COALESCE(e.emax, 1), 1) * p.deg)
      - (1.0 - CASE WHEN p.internal >= 2
               THEN COALESCE(t.tri, 0) / (p.internal * (p.internal - 1) / 2.0)
               ELSE 0.0 END)
    ELSE 0.0 END AS perm
  FROM per p LEFT JOIN emax e ON e.id = p.id LEFT JOIN itc t ON t.id = p.id
)
SELECT n.id, ROUND(COALESCE(sc.perm, 0.0), 6) AS permanence
FROM nodes n LEFT JOIN sc ON sc.id = n.id
"""


def attr_assort_sql(cte: str) -> str:
    """Pearson correlation of documents.n_chars across edges."""
    return f"""
WITH {cte},
val AS (SELECT doc_id AS id, CAST(n_chars AS DOUBLE) AS v FROM documents)
SELECT ROUND(CORR(va.v, vb.v), 6) AS assortativity
FROM sym s JOIN val va ON va.id = s.src JOIN val vb ON vb.id = s.dst
"""


def partition_measures_sql(cte: str) -> str:
    """Jaccard / node-structural-Rand / graph-structural-Rand between the
    fixed partitions id%3 and id%5, as one scalar row."""
    return f"""
WITH {cte},
ct AS (SELECT id % 3 AS la, id % 5 AS lb, count(*) AS n FROM nodes GROUP BY 1, 2),
tot AS (SELECT SUM(n) AS n FROM ct),
s11 AS (SELECT SUM(n * (n - 1) / 2.0) AS v FROM ct),
sa AS (SELECT SUM(m * (m - 1) / 2.0) AS v FROM (SELECT SUM(n) AS m FROM ct GROUP BY la) z),
sb AS (SELECT SUM(m * (m - 1) / 2.0) AS v FROM (SELECT SUM(n) AS m FROM ct GROUP BY lb) z),
gr AS (
  SELECT CAST(SUM(CASE WHEN (src % 3 = dst % 3) <> (src % 5 = dst % 5)
                  THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS v
  FROM sym WHERE src < dst
)
SELECT
  ROUND((SELECT v FROM s11) /
        ((SELECT v FROM sa) + (SELECT v FROM sb) - (SELECT v FROM s11)), 6) AS jaccard,
  ROUND(1.0 - ((SELECT n FROM tot) * ((SELECT n FROM tot) - 1) / 2.0
               - (SELECT v FROM sa) - (SELECT v FROM sb) + 2 * (SELECT v FROM s11))
            / ((SELECT n FROM tot) * ((SELECT n FROM tot) - 1) / 2.0), 6) AS node_rand,
  ROUND((SELECT v FROM gr), 6) AS graph_rand
"""


def betweenness_sql(
    cte: str, hops: int = 12, n_samples: int | None = None, seed: int = 42
) -> str:
    """EXACT betweenness via the pair-sum identity — independent of the
    engine's Brandes back-propagation: with all-pairs (dist, #shortest
    paths σ) from a level-synchronous unrolled DP,

        bc(v) = ½ Σ_{s≠v≠t} σ_sv·σ_vt/σ_st · [d_sv + d_vt = d_st]

    (½ = undirected ordered-pair double count, matching networkx/engine
    convention, normalized=False).

    With ``n_samples`` the sum is restricted to the EstimateBetweenness
    portable-hash source sample (the identical top-k by md5 phash the
    engine picks with portable=True) and scaled by n/|S| — re-deriving
    the sampled estimator without Brandes back-prop."""
    parts = [
        "b0 AS MATERIALIZED (SELECT id AS s, id AS v, 0 AS dist, CAST(1 AS DOUBLE) AS sigma FROM nodes)",
        "c0 AS MATERIALIZED (SELECT * FROM b0)",
    ]
    for h in range(1, hops + 1):
        p = h - 1
        parts.append(
            f"b{h} AS MATERIALIZED (SELECT b.s, e.dst AS v, {h} AS dist, SUM(b.sigma) AS sigma "
            f"FROM b{p} b JOIN sym e ON e.src = b.v "
            f"LEFT JOIN c{p} c ON c.s = b.s AND c.v = e.dst "
            f"WHERE c.v IS NULL GROUP BY b.s, e.dst)"
        )
        parts.append(
            f"c{h} AS MATERIALIZED (SELECT * FROM c{p} UNION ALL SELECT * FROM b{h})"
        )
    chain = ",\n".join(parts)
    if n_samples is None:
        samp = ""
        src_filter = ""
        factor = "/ 2.0"
    else:
        key = phash_sql("id", str(seed))
        parts_s = (
            f"samp AS MATERIALIZED (SELECT id FROM nodes"
            f" ORDER BY {key}, id LIMIT {n_samples}),"
        )
        samp = parts_s + "\n"
        src_filter = " AND sv.s IN (SELECT id FROM samp)"
        factor = (
            f"* ((SELECT COUNT(*) FROM nodes) * 1.0 / {n_samples}) / 2.0"
        )
    return f"""
WITH {cte},
{chain},
{samp}bc AS (
  SELECT sv.v AS id, SUM(sv.sigma * vt.sigma / st.sigma) AS raw
  FROM c{hops} sv
  JOIN c{hops} vt ON vt.s = sv.v AND vt.dist > 0
  JOIN c{hops} st ON st.s = sv.s AND st.v = vt.v AND st.dist = sv.dist + vt.dist
  WHERE sv.dist > 0 AND sv.s <> vt.v{src_filter}
  GROUP BY sv.v
)
SELECT n.id, ROUND(COALESCE(bc.raw, 0.0) {factor}, 4) AS score
FROM nodes n LEFT JOIN bc ON bc.id = n.id
"""


def laplacian_sql(cte: str) -> str:
    """Laplacian centrality closed form: wdeg² + Σ_u (2·wdeg_u·w + w²)."""
    return f"""
WITH {cte},
deg AS (SELECT src AS id, SUM(weight) AS wdeg FROM sym GROUP BY src),
nb AS (
  SELECT s.src AS id,
         SUM(2.0 * du.wdeg * s.weight + s.weight * s.weight) AS nsum
  FROM sym s JOIN deg du ON du.id = s.dst
  GROUP BY s.src
)
SELECT n.id, ROUND(COALESCE(d.wdeg, 0.0) * COALESCE(d.wdeg, 0.0)
                   + COALESCE(nb.nsum, 0.0), 6) AS score
FROM nodes n LEFT JOIN deg d ON d.id = n.id LEFT JOIN nb ON nb.id = n.id
"""


# ---------------------------------------------------------------------------
# Topological levels (Kahn layering) + maximal cliques
# ---------------------------------------------------------------------------


def topo_levels_sql(cte: str) -> str:
    """Kahn levels on the low->high oriented DAG (acyclic by construction):
    level(v) = longest path from the source frontier. Recursive CTE with
    UNION dedup keeps the state at most n * depth rows."""
    return f"""
WITH RECURSIVE {cte},
dag AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst GROUP BY src, dst),
dn AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM dag UNION SELECT dst FROM dag) u
),
lv(id, lvl) AS (
  SELECT id, 0 FROM dn WHERE id NOT IN (SELECT dst FROM dag)
  UNION
  SELECT d.dst, lv.lvl + 1 FROM lv JOIN dag d ON d.src = lv.id
)
SELECT id, CAST(MAX(lvl) AS INT) AS level FROM lv GROUP BY id
"""


def reachable_counts_sql(cte: str, mod: int = 60, keep: int = 3) -> str:
    """Exact reachable-set sizes (self included) on the sparsified mod-N
    DAG contraction of the doc graph (reachability/ReachableNodes.cpp
    exact mode) — recursive transitive-closure CTE, UNION dedup."""
    return f"""
WITH RECURSIVE {cte},
cg AS MATERIALIZED (
  SELECT src % {mod} AS src, dst % {mod} AS dst FROM edges
  WHERE src % {mod} < dst % {mod}
    AND ((src % {mod}) * 7 + (dst % {mod}) * 11) % {keep} = 0
  GROUP BY 1, 2
),
cn AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM cg UNION SELECT dst FROM cg) u
),
reach(source, id) AS (
  SELECT id, id FROM cn
  UNION
  SELECT r.source, e.dst FROM reach r JOIN cg e ON e.src = r.id
)
SELECT source AS id, count(*) AS reachable FROM reach GROUP BY source
"""


def simple_paths_sql(
    cte: str, mod: int = 24, keep: int = 8, source: int = 0,
    target: int = 7, cutoff: int = 5,
) -> str:
    """All simple source→target paths under the cutoff on the sparsified
    mod-N contraction (cycles kept — the revisit filter is the point);
    recursive CTE growing vertex lists, path emitted as '->' string."""
    return f"""
WITH RECURSIVE {cte},
cg AS MATERIALIZED (
  SELECT src % {mod} AS src, dst % {mod} AS dst FROM edges
  WHERE src % {mod} <> dst % {mod}
    AND ((src % {mod}) * 7 + (dst % {mod}) * 11) % {keep} = 0
  GROUP BY 1, 2
),
walk(last, path, hops) AS (
  SELECT CAST({source} AS BIGINT), [CAST({source} AS BIGINT)], 0
  UNION ALL
  SELECT e.dst, list_append(w.path, e.dst), w.hops + 1
  FROM walk w JOIN cg e ON e.src = w.last
  WHERE w.last <> {target} AND w.hops < {cutoff}
    AND NOT list_contains(w.path, e.dst)
)
SELECT array_to_string(path, '->') AS path, CAST(hops AS INT) AS hops
FROM walk WHERE last = {target}
"""


def scd_truth_sql(cte: str, mod: int = 24, keep: int = 8, seeds=(1, 2, 5)) -> str:
    """SCDGroundTruthComparison replay: detected = 2-hop out-balls of the
    seeds on the sparsified mod-N contraction; truth cover = id%6 labels;
    per-seed tp/sizes/precision/recall/f1/jaccard re-derived in SQL
    (rounding applied AFTER f1, matching the engine)."""
    seed_vals = ", ".join(f"(CAST({s} AS BIGINT))" for s in seeds)
    return f"""
WITH {cte},
cg AS MATERIALIZED (
  SELECT src % {mod} AS src, dst % {mod} AS dst FROM edges
  WHERE src % {mod} <> dst % {mod}
    AND ((src % {mod}) * 7 + (dst % {mod}) * 11) % {keep} = 0
  GROUP BY 1, 2
),
cn AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM cg UNION SELECT dst FROM cg) u
),
seeds(seed) AS (VALUES {seed_vals}),
h0 AS (SELECT seed, seed AS id FROM seeds),
h1 AS (SELECT seed, id FROM h0
       UNION SELECT h.seed, e.dst FROM h0 h JOIN cg e ON e.src = h.id),
h2 AS (SELECT seed, id FROM h1
       UNION SELECT h.seed, e.dst FROM h1 h JOIN cg e ON e.src = h.id),
cov AS (SELECT id, id % 6 AS label FROM cn),
sl AS (SELECT DISTINCT s.seed, c.label FROM seeds s JOIN cov c ON c.id = s.seed),
gt AS (SELECT DISTINCT sl.seed, c.id FROM sl JOIN cov c ON c.label = sl.label),
tpx AS (SELECT d.seed, count(*) AS tp FROM h2 d
        JOIN gt g ON g.seed = d.seed AND g.id = d.id GROUP BY d.seed),
dsx AS (SELECT seed, count(*) AS det_size FROM h2 GROUP BY seed),
tsx AS (SELECT seed, count(*) AS truth_size FROM gt GROUP BY seed),
m AS (
  SELECT s.seed,
         COALESCE(tpx.tp, 0) AS tp,
         COALESCE(dsx.det_size, 0) AS det_size,
         COALESCE(tsx.truth_size, 0) AS truth_size
  FROM seeds s
  LEFT JOIN dsx USING (seed) LEFT JOIN tsx USING (seed) LEFT JOIN tpx USING (seed)
),
pr AS (
  SELECT seed, tp, det_size, truth_size,
         CASE WHEN det_size > 0 THEN tp * 1.0 / det_size ELSE 0.0 END AS p,
         CASE WHEN truth_size > 0 THEN tp * 1.0 / truth_size ELSE 0.0 END AS r
  FROM m
)
SELECT seed, tp, det_size, truth_size,
       ROUND(p, 6) AS "precision",
       ROUND(r, 6) AS recall,
       ROUND(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS f1,
       ROUND(CASE WHEN det_size + truth_size - tp > 0
                  THEN tp * 1.0 / (det_size + truth_size - tp) ELSE 0.0 END, 6)
         AS jaccard
FROM pr
"""


def clique_hist_sql(cte: str) -> str:
    """Maximal-clique size histogram. Enumerates all cliques as sorted member
    lists grown one id at a time (recursive CTE; list_has_all = adjacency-to-
    all test), keeps those with no adjacent-to-all outside vertex."""
    return f"""
WITH RECURSIVE {cte},
adj AS MATERIALIZED (SELECT src AS id, list_sort(list(dst)) AS nbrs FROM sym GROUP BY src),
cl(members, last) AS (
  SELECT [id], id FROM nodes
  UNION ALL
  SELECT list_append(c.members, a.id), a.id
  FROM cl c JOIN adj a ON a.id > c.last AND list_has_all(a.nbrs, c.members)
),
maxi AS (
  SELECT members FROM cl c
  WHERE NOT EXISTS (
    SELECT 1 FROM adj a
    WHERE list_has_all(a.nbrs, c.members) AND NOT list_contains(c.members, a.id)
  )
)
SELECT CAST(len(members) AS INT) AS size, count(*) AS n_cliques FROM maxi GROUP BY size
"""


def group_degree_sql(cte: str, k: int = 3) -> str:
    """Unrolled greedy group-degree (k rounds): round i picks the
    non-group vertex with the most still-uncovered neighbors (ties by min
    id); covered = group + its neighborhoods. Mirrors algs/bfs.py::
    group_degree exactly, including the gain>0 stop rule."""
    parts = [
        "symp AS MATERIALIZED (SELECT src, dst FROM sym WHERE src <> dst)",
        "g1 AS MATERIALIZED (SELECT src FROM (SELECT src, count(*) AS gain "
        "FROM symp GROUP BY src) z ORDER BY gain DESC, src ASC LIMIT 1)",
        "c1 AS MATERIALIZED (SELECT src AS id FROM g1 UNION "
        "SELECT dst FROM symp WHERE src IN (SELECT src FROM g1))",
    ]
    for i in range(2, k + 1):
        p = i - 1
        grp = " UNION ".join(f"SELECT src FROM g{j}" for j in range(1, i))
        parts.append(
            f"cand{i} AS MATERIALIZED (SELECT s.src, count(*) AS gain FROM symp s "
            f"WHERE s.dst NOT IN (SELECT id FROM c{p}) "
            f"AND s.src NOT IN ({grp}) GROUP BY s.src)"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT src FROM cand{i} WHERE gain > 0 "
            f"ORDER BY gain DESC, src ASC LIMIT 1)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT id FROM c{p} UNION SELECT src FROM g{i} "
            f"UNION SELECT dst FROM symp WHERE src IN (SELECT src FROM g{i}))"
        )
    sel = " UNION ALL ".join(f"SELECT src AS id FROM g{j}" for j in range(1, k + 1))
    return f"WITH {cte},\n" + ",\n".join(parts) + f"\n{sel}"


def degree_invariant_sql(cte: str) -> str:
    """Undirected degrees of the ORIGINAL graph — the oracle for
    degree-preserving randomization (edge switching's contract is that
    the switched graph's degree table equals this exactly)."""
    return f"""
WITH {cte},
canon AS (SELECT src, dst FROM sym WHERE src < dst)
SELECT id, count(*) AS degree FROM (
  SELECT src AS id FROM canon UNION ALL SELECT dst AS id FROM canon
) z GROUP BY id
"""


def group_closeness_sql(cte: str, k: int = 3, hops: int = 12) -> str:
    """Unrolled greedy group-closeness over the all-pairs hop-distance
    table: round i adds the vertex maximizing the farness reduction
    sum_u max(cur_u - d(v,u), 0), unreached penalty = n; ties by min id.
    Mirrors algs/bfs.py::group_closeness exactly."""
    ap = f"ap{hops}"
    parts = [
        _all_pairs_cte(hops),
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "cur0 AS MATERIALIZED (SELECT id AS u, (SELECT n FROM nn) AS d FROM nodes)",
    ]
    for i in range(1, k + 1):
        p = i - 1
        grp = (
            " UNION ".join(f"SELECT v FROM g{j}" for j in range(1, i))
            if i > 1
            else "SELECT CAST(NULL AS BIGINT) AS v WHERE FALSE"
        )
        parts.append(
            f"red{i} AS MATERIALIZED (SELECT a.s AS v, "
            f"SUM(GREATEST(c.d - a.dist, 0.0)) AS red "
            f"FROM {ap} a JOIN cur{p} c ON c.u = a.id "
            f"WHERE a.s NOT IN ({grp}) GROUP BY a.s)"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT v FROM red{i} WHERE red > 0.0 "
            f"ORDER BY red DESC, v ASC LIMIT 1)"
        )
        parts.append(
            f"cur{i} AS MATERIALIZED (SELECT c.u, "
            f"LEAST(c.d, COALESCE(a.dist, c.d)) AS d FROM cur{p} c "
            f"LEFT JOIN (SELECT id, CAST(dist AS DOUBLE) AS dist FROM {ap} "
            f"WHERE s IN (SELECT v FROM g{i})) a ON a.id = c.u)"
        )
    sel = " UNION ALL ".join(f"SELECT v AS id FROM g{j}" for j in range(1, k + 1))
    return f"WITH {cte},\n" + ",\n".join(parts) + f"\n{sel}"


def group_harmonic_sql(cte: str, k: int = 3, hops: int = 12) -> str:
    """Unrolled greedy group-harmonic-closeness: round i adds the vertex
    maximizing sum_u max(1/d(v,u) - h_cur(u), 0) over d >= 1; h_cur
    starts at 0 (1/inf) and keeps the best member inverse distance.
    Mirrors algs/bfs.py::group_harmonic_closeness exactly."""
    ap = f"ap{hops}"
    parts = [
        _all_pairs_cte(hops),
        f"inv AS MATERIALIZED (SELECT s, id, 1.0 / dist AS inv FROM {ap} "
        "WHERE dist > 0)",
        "cur0 AS MATERIALIZED (SELECT id AS u, 0.0 AS h FROM nodes)",
    ]
    for i in range(1, k + 1):
        p = i - 1
        grp = (
            " UNION ".join(f"SELECT v FROM g{j}" for j in range(1, i))
            if i > 1
            else "SELECT CAST(NULL AS BIGINT) AS v WHERE FALSE"
        )
        parts.append(
            f"gain{i} AS MATERIALIZED (SELECT a.s AS v, "
            f"SUM(GREATEST(a.inv - c.h, 0.0)) AS gain "
            f"FROM inv a JOIN cur{p} c ON c.u = a.id "
            f"WHERE a.s NOT IN ({grp}) GROUP BY a.s)"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT v FROM gain{i} WHERE gain > 0.0 "
            f"ORDER BY gain DESC, v ASC LIMIT 1)"
        )
        parts.append(
            f"cur{i} AS MATERIALIZED (SELECT c.u, "
            f"GREATEST(c.h, COALESCE(a.inv, 0.0)) AS h FROM cur{p} c "
            f"LEFT JOIN (SELECT id, inv FROM inv "
            f"WHERE s IN (SELECT v FROM g{i})) a ON a.id = c.u)"
        )
    sel = " UNION ALL ".join(f"SELECT v AS id FROM g{j}" for j in range(1, k + 1))
    return f"WITH {cte},\n" + ",\n".join(parts) + f"\n{sel}"


def nf_heuristic_sql(cte: str, hops: int = 12) -> str:
    """Exact neighborhood function (the heuristic at full sample):
    N(h) = #pairs (s, u) with hop distance <= h, self rows included,
    for h = 0..max observed distance."""
    ap = f"ap{hops}"
    return f"""
WITH {cte},
{_all_pairs_cte(hops)},
hist AS (SELECT dist AS h, count(*) AS c FROM {ap} GROUP BY dist),
hs AS (SELECT u.h FROM (SELECT UNNEST(generate_series(0,
         (SELECT MAX(h) FROM hist))) AS h) u)
SELECT hs.h,
       CAST((SELECT SUM(c) FROM hist WHERE hist.h <= hs.h) AS DOUBLE) AS nf
FROM hs ORDER BY hs.h
"""


def square_clustering_sql(cte: str) -> str:
    """Lind-Gonzalez-Herrmann square clustering replay — the identical
    2-path/common-neighbor/adjacency join plan as
    algs/triangles.py::local_square_clustering."""
    return f"""
WITH {cte},
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym WHERE src <> dst),
deg AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM de GROUP BY src),
tp AS MATERIALIZED (
  SELECT a.src AS x, a.dst AS u, b.dst AS w
  FROM de a JOIN de b ON a.src = b.src AND a.dst < b.dst
),
cn AS MATERIALIZED (SELECT u, w, count(*) AS cn FROM tp GROUP BY u, w),
half AS (SELECT src AS u, dst AS w FROM de WHERE src < dst),
pw AS (
  SELECT tp.x AS v, cn.cn - 1 AS q,
         cn.cn + CASE WHEN h.u IS NOT NULL THEN 1 ELSE 0 END AS degm,
         du.d AS du, dw.d AS dw
  FROM tp JOIN cn ON cn.u = tp.u AND cn.w = tp.w
  LEFT JOIN half h ON h.u = tp.u AND h.w = tp.w
  JOIN deg du ON du.id = tp.u JOIN deg dw ON dw.id = tp.w
),
agg AS (SELECT v, SUM(q) AS sq,
               SUM((du - degm) + (dw - degm) + q) AS pot
        FROM pw GROUP BY v)
SELECT n.id,
       ROUND(CASE WHEN COALESCE(pot, 0) > 0
             THEN CAST(sq AS DOUBLE) / pot ELSE 0.0 END, 6) AS c4
FROM nodes n LEFT JOIN agg ON agg.v = n.id
"""


def seir_sql(
    cte: str,
    zero: int = 0,
    p_transmit: float = 0.05,
    t_latent: int = 2,
    t_infectious: int = 4,
    ticks: int = 8,
    seed: int = 42,
) -> str:
    """SEIR census replay — tick-unrolled state machine with the portable
    contact coin (matches algs/simulation.py::seir(portable=True) exactly,
    including the early stop once no Exposed/Infectious remain)."""
    parts = [
        f"s0 AS MATERIALIZED (SELECT id,"
        f" CASE WHEN id = {zero} THEN 2 ELSE 0 END AS state,"
        f" CASE WHEN id = {zero} THEN {t_infectious} ELSE 0 END AS timer"
        f" FROM nodes)"
    ]
    for t in range(1, ticks + 1):
        coin = phash_sql("e.dst", "e.src", str(seed + t))
        parts.append(
            f"x{t} AS MATERIALIZED (SELECT DISTINCT e.dst AS id"
            f" FROM s{t-1} i JOIN sym e ON e.src = i.id AND i.state = 2"
            f" WHERE ({coin} % 1000000007) / 1000000007.0 < {p_transmit!r})"
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT s.id,"
            f" CASE WHEN s.state = 0 AND x.id IS NOT NULL THEN 1"
            f" WHEN s.state = 1 AND s.timer <= 1 THEN 2"
            f" WHEN s.state = 2 AND s.timer <= 1 THEN 3"
            f" ELSE s.state END AS state,"
            f" CASE WHEN s.state = 0 AND x.id IS NOT NULL THEN {t_latent}"
            f" WHEN s.state = 1 AND s.timer <= 1 THEN {t_infectious}"
            f" WHEN s.state IN (1, 2) THEN s.timer - 1"
            f" ELSE 0 END AS timer"
            f" FROM s{t-1} s LEFT JOIN x{t} x ON x.id = s.id)"
        )
    census_rows = " UNION ALL ".join(
        f"SELECT CAST({t} AS INT) AS tick,"
        f" COUNT(*) FILTER (WHERE state = 0) AS s,"
        f" COUNT(*) FILTER (WHERE state = 1) AS e,"
        f" COUNT(*) FILTER (WHERE state = 2) AS i,"
        f" COUNT(*) FILTER (WHERE state = 3) AS r"
        f" FROM s{t}"
        for t in range(0, ticks + 1)
    )
    parts.append(f"census AS MATERIALIZED ({census_rows})")
    return (
        f"WITH {cte},\n" + ",\n".join(parts) + f"""
SELECT tick, s, e, i, r FROM census
WHERE tick <= COALESCE(
  (SELECT MIN(tick) FROM census WHERE tick > 0 AND e = 0 AND i = 0), {ticks})
ORDER BY tick
"""
    )


def ba_structure_sql(n: int = 500, k: int = 3, seed: int = 42) -> str:
    """Degree histogram of the portable-hash distributed Barabási-Albert
    graph — DuckDB re-derives every attachment edge by resolving the
    slot-reference pointer chains with a recursive CTE (indices strictly
    decrease, so the chase terminates), then mirrors the engine's
    self-loop drop + canonical dedup."""
    k0 = k
    seed_edges = [(i, j) for i in range(k0) for j in range(i + 1, k0)]
    n_seed = len(seed_edges)
    seed_vals = ", ".join(
        f"({i}, {s}, {d})" for i, (s, d) in enumerate(seed_edges)
    )
    ref = phash_sql("i", str(seed))
    return f"""
WITH RECURSIVE att AS (
  SELECT {n_seed} + i AS edge, {k0} + i // {k} AS src,
         {ref} % (2 * ({n_seed} + i)) AS ref
  FROM range({(n - k0) * k}) t(i)
),
seed_e AS (SELECT * FROM (VALUES {seed_vals}) AS t(edge, src, dst)),
chase(edge, ref) AS (
  SELECT edge, ref FROM att
  UNION ALL
  SELECT c.edge, a.ref FROM chase c JOIN att a ON a.edge = (c.ref - 1) // 2
  WHERE c.ref % 2 = 1 AND (c.ref - 1) // 2 >= {n_seed}
),
term AS (
  SELECT edge, ref FROM chase
  WHERE ref % 2 = 0 OR (ref - 1) // 2 < {n_seed}
),
resolved AS (
  SELECT a.src,
    CASE WHEN t.ref % 2 = 0 THEN
      CASE WHEN t.ref // 2 < {n_seed}
           THEN (SELECT s.src FROM seed_e s WHERE s.edge = t.ref // 2)
           ELSE {k0} + ((t.ref // 2) - {n_seed}) // {k} END
    ELSE (SELECT s.dst FROM seed_e s WHERE s.edge = (t.ref - 1) // 2)
    END AS dst
  FROM term t JOIN att a USING (edge)
),
alle AS (SELECT src, dst FROM resolved
         UNION ALL SELECT src, dst FROM seed_e),
canon AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM alle WHERE src <> dst),
deg AS (SELECT id, COUNT(*) AS degree FROM (
          SELECT a AS id FROM canon UNION ALL SELECT b FROM canon
        ) e GROUP BY id)
SELECT degree, COUNT(*) AS n FROM deg GROUP BY degree ORDER BY degree
"""


def node2vec_walks_sql(cte: str, walk_length: int = 5, seed: int = 7) -> str:
    """Unbiased (p=q=1) Node2Vec walk corpus replay, walks_per_node=1 —
    with unit bias weights the exponential race reduces to an integer
    hash race (argmax of the portable draw, ties to the smaller
    candidate), so every step unrolls to one join + one window."""
    parts = [
        "s0 AS MATERIALIZED (SELECT id AS walk_id, id AS cur FROM nodes)"
    ]
    for t in range(1, walk_length):
        h = phash_sql("s.walk_id", "e.dst", str(t), str(seed))
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT s.walk_id, e.dst AS cand,"
            f" ({h} % 1000000007) AS hc"
            f" FROM s{t-1} s JOIN sym e ON e.src = s.cur)"
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT walk_id, cand AS cur FROM ("
            f"SELECT walk_id, cand, ROW_NUMBER() OVER ("
            f"PARTITION BY walk_id ORDER BY hc DESC, cand ASC) AS rn"
            f" FROM c{t}) r WHERE rn = 1)"
        )
    corpus = " UNION ALL ".join(
        f"SELECT walk_id, CAST({t} AS INT) AS pos, cur AS vertex FROM s{t}"
        for t in range(0, walk_length)
    )
    return f"WITH {cte},\n" + ",\n".join(parts) + f"\n{corpus}"


def suitor_sql(cte: str, rounds: int = 24) -> str:
    """Suitor matching replay — round-unrolled: per round each vertex
    proposes to its best available neighbor (weight desc, id asc), mutual
    proposals lock in, matched endpoints leave the pool. Deterministic
    (no hash draws), so a fixed unroll with margin reproduces the engine
    exactly: once no mutual pair exists the state is a fixpoint and extra
    rounds are no-ops."""
    parts = [
        "av1 AS MATERIALIZED (SELECT src, dst, weight FROM sym WHERE src <> dst)"
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"pr{r} AS MATERIALIZED (SELECT src, dst, weight FROM ("
            f"SELECT src, dst, weight, ROW_NUMBER() OVER ("
            f"PARTITION BY src ORDER BY weight DESC, dst ASC) AS rn"
            f" FROM av{r}) p WHERE rn = 1)"
        )
        parts.append(
            f"mu{r} AS MATERIALIZED (SELECT a.src AS u, a.dst AS v,"
            f" a.weight FROM pr{r} a JOIN pr{r} b"
            f" ON a.src = b.dst AND a.dst = b.src WHERE a.src < a.dst)"
        )
        if r < rounds:
            parts.append(
                f"tk{r} AS MATERIALIZED (SELECT u AS id FROM mu{r}"
                f" UNION ALL SELECT v FROM mu{r})"
            )
            parts.append(
                f"av{r+1} AS MATERIALIZED (SELECT e.src, e.dst, e.weight"
                f" FROM av{r} e"
                f" WHERE e.src NOT IN (SELECT id FROM tk{r})"
                f" AND e.dst NOT IN (SELECT id FROM tk{r}))"
            )
    union = " UNION ALL ".join(
        f"SELECT u, v, weight FROM mu{r}" for r in range(1, rounds + 1)
    )
    return f"WITH {cte},\n" + ",\n".join(parts) + f"\n{union}"


def _ppr_chain(seed_vertex: int, alpha: float, iters: int) -> list[str]:
    """CTE chain r0..r{iters} for fixed-iteration personalized PageRank —
    shared by ppr_sql and nibble_sql."""
    a, b = repr(float(alpha)), repr(1.0 - float(alpha))
    parts = [
        "fr AS MATERIALIZED (SELECT src, dst,"
        " weight / SUM(weight) OVER (PARTITION BY src) AS frac FROM sym)",
        f"r0 AS MATERIALIZED (SELECT CAST({seed_vertex} AS BIGINT) AS id,"
        f" 1.0 AS rank)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT id, rank FROM ("
            f"SELECT COALESCE(s.id, {seed_vertex}) AS id,"
            f" COALESCE(s.m, 0.0) + {a} * (CASE WHEN COALESCE(s.id,"
            f" {seed_vertex}) = {seed_vertex} THEN 1.0 ELSE 0.0 END) AS rank"
            f" FROM (SELECT e.dst AS id, SUM(r.rank * e.frac * {b}) AS m"
            f"       FROM r{i-1} r JOIN fr e ON e.src = r.id GROUP BY e.dst) s"
            f" FULL JOIN (SELECT {seed_vertex} AS id) sd ON sd.id = s.id"
            f") q WHERE rank > 0)"
        )
    return parts


def ppr_sql(cte: str, seed_vertex: int = 0, alpha: float = 0.15, iters: int = 25) -> str:
    """Personalized PageRank (teleport to one seed) — fixed-iteration
    unroll mirroring algs/scd.py::personalized_pagerank: rank0 = teleport,
    rank_{t+1}(v) = (1-alpha)·Σ_u rank_t(u)·w_uv/wdeg(u) + alpha·[v=seed],
    support-sparse (zero rows dropped). Rounded to 6 dp on both sides."""
    parts = _ppr_chain(seed_vertex, alpha, iters)
    return (
        f"WITH {cte},\n" + ",\n".join(parts)
        + f"\nSELECT id, ROUND(rank, 6) AS rank FROM r{iters} ORDER BY id"
    )


def nibble_sql(
    cte: str,
    seed_vertex: int = 0,
    alpha: float = 0.15,
    iters: int = 25,
    max_support: int = 10_000,
    round_rank: int = 6,
) -> str:
    """PageRankNibble membership replay (algs/scd.py::pagerank_nibble in
    portable mode: tol=0 fixed-iteration PPR, ranks rounded before the
    sweep key). Everything downstream of the rounded ranks is exact
    arithmetic on this graph (integer weights → integer vol/cut in
    doubles), so the conductance argmin is engine-identical:

      support = top max_support by (rank/wdeg DESC, id ASC), wdeg > 0
      vol(k)  = running Σ wdeg;  internal(k) = running Σ closed edges
      cut(k)  = vol(k) − 2·internal(k);  φ(k) = cut/min(vol, 2m−vol)
      answer  = ids of the φ-argmin prefix (pos tie → smaller prefix)
    """
    parts = _ppr_chain(seed_vertex, alpha, iters)
    chain = ",\n".join(parts)
    return f"""
WITH {cte},
{chain},
ppr AS MATERIALIZED (SELECT id, ROUND(rank, {round_rank}) AS rank FROM r{iters}),
wd AS MATERIALIZED (SELECT src AS id, SUM(weight) AS wdeg FROM sym GROUP BY src),
two_m AS MATERIALIZED (SELECT SUM(weight) AS w FROM sym),
support AS MATERIALIZED (
  SELECT p.id, p.rank / w.wdeg AS key, w.wdeg
  FROM ppr p JOIN wd w ON w.id = p.id WHERE w.wdeg > 0
  ORDER BY key DESC, p.id ASC LIMIT {max_support}),
pref AS MATERIALIZED (
  SELECT id,
         ROW_NUMBER() OVER (ORDER BY key DESC, id ASC) AS pos,
         SUM(wdeg) OVER (ORDER BY key DESC, id ASC) AS vol
  FROM support),
pe AS MATERIALIZED (
  SELECT GREATEST(pu.pos, pv.pos) AS pos, SUM(s.weight) AS closed
  FROM sym s
  JOIN pref pu ON pu.id = s.src
  JOIN pref pv ON pv.id = s.dst
  WHERE s.src < s.dst
  GROUP BY GREATEST(pu.pos, pv.pos)),
sweep AS MATERIALIZED (
  SELECT p.id, p.pos, p.vol,
         p.vol - 2.0 * SUM(COALESCE(pe.closed, 0.0))
                       OVER (ORDER BY p.pos) AS cut
  FROM pref p LEFT JOIN pe ON pe.pos = p.pos),
cond AS MATERIALIZED (
  SELECT id, pos,
         CASE WHEN LEAST(vol, (SELECT w FROM two_m) - vol) > 0
              THEN cut / LEAST(vol, (SELECT w FROM two_m) - vol)
              ELSE 1.0 END AS cond
  FROM sweep),
best AS (SELECT pos FROM cond ORDER BY cond ASC, pos ASC LIMIT 1)
SELECT id FROM cond WHERE pos <= (SELECT pos FROM best) ORDER BY id
"""


def _move_chain(p: str, l: int, rounds: int, gamma: float, init: str | None = None) -> list[str]:
    """CTE chain for one portable Louvain move phase on half-edge table
    {p}e{l}: sym {p}s{l}, deg {p}d{l} (self-loops count twice), then ``rounds``
    synchronous gated move rounds {p}L{l}_0 .. {p}L{l}_{rounds} mirroring
    algs/plm.py::_local_move(portable=True) expression by expression
    (exact integer sums; the only float ops are the single gain division
    and subtraction, identical IEEE on both engines)."""
    g = repr(float(gamma))
    parts = [
        f"{p}s{l} AS MATERIALIZED (SELECT src, dst, MAX(weight) AS weight FROM ("
        f"SELECT src, dst, weight FROM {p}e{l} UNION ALL"
        f" SELECT dst, src, weight FROM {p}e{l}) b GROUP BY src, dst)",
        f"{p}d{l} AS MATERIALIZED (SELECT src AS id,"
        f" SUM(CASE WHEN src = dst THEN 2.0 * weight ELSE weight END) AS k"
        f" FROM {p}s{l} GROUP BY src)",
        (f"{p}L{l}_0 AS MATERIALIZED (SELECT d.id,"
         f" COALESCE(i.community, d.id) AS community"
         f" FROM {p}d{l} d LEFT JOIN {init} i ON i.id = d.id)")
        if init else
        f"{p}L{l}_0 AS MATERIALIZED (SELECT id, id AS community FROM {p}d{l})",
    ]
    for t in range(rounds):
        L = f"{p}L{l}_{t}"
        gbit = phash_sql("id", str(t))
        parts += [
            f"{p}V{l}_{t} AS MATERIALIZED (SELECT community, SUM(k) AS vol"
            f" FROM {L} JOIN {p}d{l} USING (id) GROUP BY community)",
            f"{p}W{l}_{t} AS MATERIALIZED (SELECT s.src AS id, lb.community AS c,"
            f" SUM(s.weight) AS w FROM {p}s{l} s JOIN {L} lb ON lb.id = s.dst"
            f" WHERE s.src <> s.dst GROUP BY s.src, lb.community)",
            f"{p}C{l}_{t} AS MATERIALIZED (SELECT COALESCE(w.id, o.id) AS id,"
            f" COALESCE(w.c, o.c) AS c, COALESCE(w.w, 0.0) AS w"
            f" FROM {p}W{l}_{t} w FULL JOIN"
            f" (SELECT id, community AS c FROM {L}) o"
            f" ON o.id = w.id AND o.c = w.c)",
            f"{p}S{l}_{t} AS MATERIALIZED (SELECT c.id, c.c, lb.community,"
            f" c.w - {g} * d.k * (v.vol - CASE WHEN c.c = lb.community"
            f" THEN d.k ELSE 0.0 END) / (SELECT w FROM {p}tw) AS gain"
            f" FROM {p}C{l}_{t} c JOIN {L} lb ON lb.id = c.id"
            f" JOIN {p}d{l} d ON d.id = c.id"
            f" JOIN {p}V{l}_{t} v ON v.community = c.c)",
            f"{p}B{l}_{t} AS MATERIALIZED (SELECT id, community, c AS target"
            f" FROM (SELECT id, community, c, ROW_NUMBER() OVER"
            f" (PARTITION BY id ORDER BY gain DESC,"
            f" CASE WHEN c = community THEN 1 ELSE 0 END DESC, c ASC) AS rn"
            f" FROM {p}S{l}_{t}) q WHERE rn = 1)",
            f"{p}P{l}_{t} AS MATERIALIZED (SELECT id, target,"
            f" CAST({gbit} % 2 AS INT) AS gbit FROM {p}B{l}_{t}"
            f" WHERE target <> community)",
            f"{p}M{l}_{t} AS MATERIALIZED (SELECT id, target FROM {p}P{l}_{t}"
            f" WHERE gbit = (CASE WHEN EXISTS"
            f" (SELECT 1 FROM {p}P{l}_{t} WHERE gbit = 0) THEN 0 ELSE 1 END))",
            f"{p}L{l}_{t + 1} AS MATERIALIZED (SELECT lb.id,"
            f" COALESCE(m.target, lb.community) AS community"
            f" FROM {L} lb LEFT JOIN {p}M{l}_{t} m ON m.id = lb.id)",
        ]
    return parts


def louvain_sql(cte: str, gamma: float = 1.0, rounds: int = 6) -> str:
    """Two-level portable Louvain replay (algs/plm.py::louvain with
    max_levels=2, max_rounds=``rounds``, portable=True): level-0 move
    phase on the half-edge graph, coarsen by community (least/greatest
    contraction, intra edges → self-loops), level-1 move phase, labels
    composed only if level 0 actually shrank (the engine's break rule),
    then canonical min-member-id relabeling."""
    parts = [
        "lve0 AS MATERIALIZED (SELECT src, dst, weight FROM sym WHERE src <= dst)",
    ]
    # two_w from the level-0 symmetrized view (engine: g.symmetric_edges()
    # sum); placed before the level chains which reference lvtw in gains.
    parts.append(
        "lvtw AS MATERIALIZED (SELECT SUM(weight) AS w FROM ("
        "SELECT src, dst, MAX(weight) AS weight FROM ("
        "SELECT src, dst, weight FROM lve0 UNION ALL"
        " SELECT dst, src, weight FROM lve0) b GROUP BY src, dst) s)"
    )
    parts += _move_chain('lv', 0, rounds, gamma)
    parts += [
        f"lvsh0 AS MATERIALIZED (SELECT"
        f" (SELECT COUNT(DISTINCT community) FROM lvL0_{rounds})"
        f" < (SELECT COUNT(*) FROM lvL0_{rounds}) AS s)",
        f"lve1 AS MATERIALIZED (SELECT LEAST(ls.community, ld.community) AS src,"
        f" GREATEST(ls.community, ld.community) AS dst,"
        f" SUM(e.weight) AS weight FROM lve0 e"
        f" JOIN lvL0_{rounds} ls ON ls.id = e.src"
        f" JOIN lvL0_{rounds} ld ON ld.id = e.dst GROUP BY 1, 2)",
    ]
    parts += _move_chain('lv', 1, rounds, gamma)
    chain = ",\n".join(parts)
    return f"""
WITH {cte},
{chain},
lvraw AS MATERIALIZED (
  SELECT m.id,
         CASE WHEN (SELECT s FROM lvsh0) THEN l1.community
              ELSE m.community END AS label
  FROM lvL0_{rounds} m LEFT JOIN lvL1_{rounds} l1 ON l1.id = m.community),
lvcanon AS (SELECT label, MIN(id) AS lvcanon FROM lvraw GROUP BY label)
SELECT r.id, c.lvcanon AS label FROM lvraw r JOIN lvcanon c ON c.label = r.label
"""


def _refine_chain(p: str, rounds: int, gamma: float) -> list[str]:
    """CTE chain for the Leiden refinement phase on level-0 tables
    ({p}s0 sym, {p}d0 deg, {p}tw 2W), mirroring
    algs/leiden.py::_refine(portable=True): singleton-only merges into
    positive-gain sub-communities of the same parent, alternating-parity
    portable gate with complementary fallback. State R{t}(id, ref,
    parent); R0 starts from the move-phase communities {p}L0_* (ref =
    id)."""
    g = repr(float(gamma))
    parts = []
    for t in range(rounds):
        R = f"{p}R{t}"
        gbit = phash_sql("id")
        a, b = t % 2, (t + 1) % 2
        parts += [
            f"{p}RZ{t} AS MATERIALIZED (SELECT ref, COUNT(*) AS sz"
            f" FROM {R} GROUP BY ref)",
            f"{p}RC{t} AS MATERIALIZED (SELECT s.src AS id, ts.ref AS target,"
            f" SUM(s.weight) AS w FROM {p}s0 s"
            f" JOIN {R} ts ON ts.id = s.dst"
            f" JOIN {R} ss ON ss.id = s.src"
            f" JOIN {p}RZ{t} z ON z.ref = ss.ref"
            f" WHERE s.src <> s.dst AND ss.parent = ts.parent"
            f" AND ss.ref <> ts.ref AND z.sz = 1"
            f" GROUP BY s.src, ts.ref)",
            f"{p}RV{t} AS MATERIALIZED (SELECT ref, SUM(k) AS vol"
            f" FROM {R} JOIN {p}d0 USING (id) GROUP BY ref)",
            f"{p}RS{t} AS MATERIALIZED (SELECT * FROM ("
            f"SELECT c.id, c.target,"
            f" c.w - {g} * d.k * v.vol / (SELECT w FROM {p}tw) AS gain"
            f" FROM {p}RC{t} c JOIN {p}d0 d ON d.id = c.id"
            f" JOIN {p}RV{t} v ON v.ref = c.target) q WHERE gain > 0)",
            f"{p}RR{t} AS MATERIALIZED (SELECT id, target,"
            f" CAST({gbit} % 2 AS INT) AS gbit FROM ("
            f"SELECT id, target, gain, ROW_NUMBER() OVER (PARTITION BY id"
            f" ORDER BY gain DESC, target ASC) AS rn FROM {p}RS{t}) q"
            f" WHERE rn = 1)",
            f"{p}RM{t} AS MATERIALIZED (SELECT id, target FROM {p}RR{t}"
            f" WHERE gbit = (CASE WHEN EXISTS"
            f" (SELECT 1 FROM {p}RR{t} WHERE gbit = {a})"
            f" THEN {a} ELSE {b} END))",
            f"{p}R{t + 1} AS MATERIALIZED (SELECT r.id,"
            f" COALESCE(m.target, r.ref) AS ref, r.parent"
            f" FROM {R} r LEFT JOIN {p}RM{t} m ON m.id = r.id)",
        ]
    return parts


def leiden_sql(
    cte: str, gamma: float = 1.0, rounds: int = 4, refine_rounds: int = 4
) -> str:
    """Portable Leiden replay (algs/leiden.py::leiden with max_levels=1,
    max_rounds=``rounds``, refine_rounds=``refine_rounds``,
    portable=True): level-0 move phase → refinement from singletons →
    if the refined partition shrank, coarsen by REFINED blocks and run
    the post-loop move phase seeded with each block's min move-community;
    labels = that phase's communities composed through the refined
    mapping, else the level-0 move communities. Canonical min-member-id
    output either way."""
    p = "ld"
    parts = [
        f"{p}e0 AS MATERIALIZED (SELECT src, dst, weight FROM sym WHERE src <= dst)",
        f"{p}tw AS MATERIALIZED (SELECT SUM(weight) AS w FROM ("
        f"SELECT src, dst, MAX(weight) AS weight FROM ("
        f"SELECT src, dst, weight FROM {p}e0 UNION ALL"
        f" SELECT dst, src, weight FROM {p}e0) b GROUP BY src, dst) s)",
    ]
    parts += _move_chain(p, 0, rounds, gamma)
    comm0 = f"{p}L0_{rounds}"
    parts.append(
        f"{p}R0 AS MATERIALIZED (SELECT id, id AS ref,"
        f" community AS parent FROM {comm0})"
    )
    parts += _refine_chain(p, refine_rounds, gamma)
    ref0 = f"{p}R{refine_rounds}"
    parts += [
        f"{p}sh0 AS MATERIALIZED (SELECT"
        f" (SELECT COUNT(DISTINCT ref) FROM {ref0})"
        f" < (SELECT COUNT(*) FROM {ref0}) AS s)",
        f"{p}e1 AS MATERIALIZED (SELECT LEAST(ls.ref, ld_.ref) AS src,"
        f" GREATEST(ls.ref, ld_.ref) AS dst, SUM(e.weight) AS weight"
        f" FROM {p}e0 e JOIN {ref0} ls ON ls.id = e.src"
        f" JOIN {ref0} ld_ ON ld_.id = e.dst GROUP BY 1, 2)",
        f"{p}init1 AS MATERIALIZED (SELECT r.ref AS id,"
        f" MIN(c.community) AS community FROM {ref0} r"
        f" JOIN {comm0} c ON c.id = r.id GROUP BY r.ref)",
    ]
    parts += _move_chain(p, 1, rounds, gamma, init=f"{p}init1")
    comm1 = f"{p}L1_{rounds}"
    chain = ",\n".join(parts)
    return f"""
WITH {cte},
{chain},
ldraw AS MATERIALIZED (
  SELECT c0.id,
         CASE WHEN (SELECT s FROM {p}sh0) THEN l1.community
              ELSE c0.community END AS label
  FROM {comm0} c0
  JOIN {ref0} r ON r.id = c0.id
  LEFT JOIN {comm1} l1 ON l1.id = r.ref),
ldcanon AS (SELECT label, MIN(id) AS canon FROM ldraw GROUP BY label)
SELECT r.id, c.canon AS label FROM ldraw r JOIN ldcanon c ON c.label = r.label
"""


def ego_cover_sql(cte: str, max_ego_degree: int = 100, plp_iters: int = 10) -> str:
    """EgoSplitting Cover replay (algs/egosplit.py::ego_splitting with
    portable=True): ego-net parts re-derived as the true component minimum
    via a reachability recursive CTE (the engine's label-min fixpoint
    converges to exactly that), portable md5 persona ids, persona-graph
    PLP replayed with the shared unrolled chain, overlapping cover
    projected back per (vertex, persona)."""
    pid = phash_sql("u", "part")
    chain = ",\n".join(_plp_chain("eg", plp_iters))
    return f"""
WITH RECURSIVE {cte},
egsd AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym WHERE src <> dst),
egdeg AS (SELECT src, COUNT(*) AS d FROM egsd GROUP BY src),
egkeep AS (SELECT src FROM egdeg WHERE d <= {max_ego_degree}),
egs AS MATERIALIZED (SELECT e.src, e.dst FROM egsd e
  JOIN egkeep k1 ON k1.src = e.src JOIN egkeep k2 ON k2.src = e.dst),
egw AS MATERIALIZED (
  SELECT ua.src AS u, ua.dst AS a, ub.dst AS b
  FROM egs ua JOIN egs ub ON ub.src = ua.src AND ua.dst < ub.dst
  JOIN egs ab ON ab.src = ua.dst AND ab.dst = ub.dst),
ege AS MATERIALIZED (SELECT u, a, b FROM egw
  UNION SELECT u, b AS a, a AS b FROM egw),
egreach(u, v, w) AS (
  SELECT src AS u, dst AS v, dst AS w FROM egs
  UNION
  SELECT r.u, r.v, e.b FROM egreach r JOIN ege e ON e.u = r.u AND e.a = r.w),
egparts AS MATERIALIZED (SELECT u, v, MIN(w) AS part FROM egreach GROUP BY u, v),
egper AS MATERIALIZED (SELECT u, v, {pid} AS pid FROM egparts),
egped AS MATERIALIZED (
  SELECT l.pid AS src, r.pid AS dst, 1.0 AS weight
  FROM egper l JOIN egper r ON r.u = l.v AND r.v = l.u WHERE l.u < l.v),
egsymn AS MATERIALIZED (SELECT src, dst, MAX(weight) AS weight FROM (
  SELECT src, dst, weight FROM egped
  UNION ALL SELECT dst, src, weight FROM egped) b
  WHERE src <> dst GROUP BY src, dst),
egnodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM egsymn),
{chain},
egcanon AS (SELECT label, MIN(id) AS cl FROM egl{plp_iters} GROUP BY label),
egplab AS (SELECT l.id, c.cl AS label
  FROM egl{plp_iters} l JOIN egcanon c ON c.label = l.label),
egown AS (SELECT DISTINCT u, pid FROM egper)
SELECT DISTINCT o.u AS id, p.label FROM egown o JOIN egplab p ON p.id = o.pid
"""


def effective_resistance_sql(
    cte: str, k: int = 15, u: int = 1, v: int = 2, iters: int = 400
) -> str:
    """r_eff(u, v) on the mod-k contracted doc graph — the oracle solves
    the SAME linear system the engine's CG solves (L x = e_u − e_v on the
    identical integer-weight contraction), by grounding x_v = 0 and
    iterating Jacobi x_i = (b_i + Σ_j w_ij x_j)/wdeg_i; any convergent
    solver reaches the same fixed point, so the 6dp-rounded value matches
    the engine's CG independent of trajectory (Jacobi error at ``iters``
    verified ~1e-13 vs numpy pinv on this graph, far under rounding)."""
    parts = [
        f"erc AS MATERIALIZED (SELECT src % {k} AS src, dst % {k} AS dst,"
        f" SUM(weight) AS weight FROM sym WHERE src % {k} <> dst % {k}"
        f" GROUP BY 1, 2)",
        "erd AS MATERIALIZED (SELECT src AS id, SUM(weight) AS wd"
        " FROM erc GROUP BY src)",
        "erx0 AS MATERIALIZED (SELECT id, 0.0 AS x FROM erd)",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f"erx{t} AS MATERIALIZED (SELECT n.id,"
            f" CASE WHEN n.id = {v} THEN 0.0 ELSE"
            f" ((CASE WHEN n.id = {u} THEN 1.0 ELSE 0.0 END)"
            f" + COALESCE(m.s, 0.0)) / n.wd END AS x"
            f" FROM erd n LEFT JOIN (SELECT s.src AS id,"
            f" SUM(s.weight * x.x) AS s FROM erc s"
            f" JOIN erx{p} x ON x.id = s.dst GROUP BY s.src) m"
            f" ON m.id = n.id)"
        )
    chain = ",\n".join(parts)
    return f"""
WITH {cte},
{chain}
SELECT CAST({u} AS BIGINT) AS u, CAST({v} AS BIGINT) AS v,
       ROUND((SELECT x FROM erx{iters} WHERE id = {u}), 6) AS r_eff
"""


def _lsh_planes_cte(dim: int, n_planes: int, seed: int) -> str:
    ph = phash_sql("pd.d", "pd.j", str(seed))
    return (
        f"pd AS MATERIALIZED (SELECT d.range AS d, j.range AS j FROM"
        f" range({dim}) d, range({n_planes}) j),\n"
        f"pl AS MATERIALIZED (SELECT pd.j,"
        f" LIST(({ph} / 1152921504606846976.0 - 0.5) ORDER BY pd.d) AS pv"
        f" FROM pd GROUP BY pd.j)"
    )


def lsh_topk_sql(
    n_planes: int = 8, k: int = 5, seed: int = 42, dim: int = 64,
    q_max: int = 10,
) -> str:
    """Single-probe hyperplane-LSH top-k replay: regenerate the portable
    md5 planes, recompute every signature (sign bits of DOUBLE[] inner
    products), bucket-join, exact-score, top-k."""
    return f"""
WITH {_lsh_planes_cte(dim, n_planes, seed)},
sig AS MATERIALIZED (
  SELECT e.vec_id AS id,
         SUM(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), pl.pv) > 0
             THEN (CAST(1 AS BIGINT) << pl.j) ELSE 0 END) AS bucket
  FROM embeddings e, pl GROUP BY e.vec_id),
cand AS (
  SELECT q.id AS query_id, e.id AS neighbor_id
  FROM sig q JOIN sig e ON q.bucket = e.bucket AND e.id <> q.id
  WHERE q.id < {q_max}),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(en.embedding AS DOUBLE[])) AS cos
  FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id
              JOIN embeddings en ON en.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, ROUND(cos, 4) AS cos FROM (
  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored) t WHERE rn <= {k}
"""


def lsh_banded_topk_sql(
    n_planes: int = 16, bands: int = 8, k: int = 5, seed: int = 42,
    dim: int = 64, q_max: int = 10,
) -> str:
    """OR-banded hyperplane-LSH top-k replay — per-band bit-group buckets,
    candidates from ANY matching band, deduplicated, exact-scored."""
    rpb = n_planes // bands
    return f"""
WITH {_lsh_planes_cte(dim, n_planes, seed)},
sigb AS MATERIALIZED (
  SELECT e.vec_id AS id, pl.j // {rpb} AS band,
         SUM(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), pl.pv) > 0
             THEN (CAST(1 AS BIGINT) << (pl.j % {rpb})) ELSE 0 END) AS bucket
  FROM embeddings e, pl GROUP BY e.vec_id, pl.j // {rpb}),
cand AS (
  SELECT DISTINCT q.id AS query_id, e.id AS neighbor_id
  FROM sigb q JOIN sigb e ON q.band = e.band AND q.bucket = e.bucket
                          AND e.id <> q.id
  WHERE q.id < {q_max}),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(en.embedding AS DOUBLE[])) AS cos
  FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id
              JOIN embeddings en ON en.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, ROUND(cos, 4) AS cos FROM (
  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored) t WHERE rn <= {k}
"""


def _embed_union_cte(
    n_clones: int = 40, id_offset: int = 100_000, delta: float = 0.15
) -> str:
    """Base embeddings ∪ deterministic near-dup clones: for vec_id <
    n_clones, a copy at vec_id+id_offset whose first coordinate is shifted
    by ``delta`` — the table's vectors are unit-norm, so delta=0.15 puts
    every clone at cosine ≥ 0.988 to its source, far above the natural
    max pair cosine (~0.51): the planted pairs are exactly the near-dup
    ground truth on both engines."""
    return (
        f"emb AS MATERIALIZED ("
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
        f" UNION ALL "
        f"SELECT vec_id + {id_offset},"
        f" list_concat([CAST(embedding AS DOUBLE[])[1] + {delta}],"
        f" CAST(embedding AS DOUBLE[])[2:])"
        f" FROM embeddings WHERE vec_id < {n_clones})"
    )


def _embed_near_dup_cte(
    threshold: float = 0.9, n_planes: int = 16, bands: int = 8,
    seed: int = 42, dim: int = 64, n_clones: int = 40,
) -> str:
    """Shared replay of embedding_near_duplicate_pairs (portable planes →
    banded sign-bit signatures → any-band candidate join → exact cosine
    verify ≥ threshold) ending in a ``hits(a, b, cos)`` CTE."""
    rpb = n_planes // bands
    return f"""{_lsh_planes_cte(dim, n_planes, seed)},
{_embed_union_cte(n_clones)},
sigb AS MATERIALIZED (
  SELECT e.vec_id AS id, pl.j // {rpb} AS band,
         SUM(CASE WHEN list_inner_product(e.v, pl.pv) > 0
             THEN (CAST(1 AS BIGINT) << (pl.j % {rpb})) ELSE 0 END) AS bucket
  FROM emb e, pl GROUP BY e.vec_id, pl.j // {rpb}),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM sigb x JOIN sigb y ON x.band = y.band AND x.bucket = y.bucket
                          AND x.id < y.id),
hits AS MATERIALIZED (
  SELECT c.a, c.b, list_cosine_similarity(ea.v, eb.v) AS cos
  FROM cand c JOIN emb ea ON ea.vec_id = c.a JOIN emb eb ON eb.vec_id = c.b
  WHERE list_cosine_similarity(ea.v, eb.v) >= {threshold})"""


def embed_near_dup_sql(
    threshold: float = 0.9, n_planes: int = 16, bands: int = 8,
    seed: int = 42, dim: int = 64, n_clones: int = 40,
) -> str:
    return f"""
WITH {_embed_near_dup_cte(threshold, n_planes, bands, seed, dim, n_clones)}
SELECT a, b, ROUND(cos, 4) AS cos FROM hits
"""


def embed_near_dup_groups_sql(
    threshold: float = 0.9, n_planes: int = 16, bands: int = 8,
    seed: int = 42, dim: int = 64, n_clones: int = 40,
) -> str:
    """Near-dup pairs closed into dedup groups: recursive label-min
    propagation over the verified pairs (same closure as
    minhash_groups_sql), keep = canonical min-id representative."""
    return f"""
WITH RECURSIVE {_embed_near_dup_cte(threshold, n_planes, bands, seed, dim, n_clones)},
pe AS MATERIALIZED (SELECT a AS src, b AS dst FROM hits UNION SELECT b, a FROM hits),
gr(id, label) AS (
  SELECT vec_id, vec_id FROM emb
  UNION
  SELECT p.dst, g.label FROM gr g JOIN pe p ON p.src = g.id WHERE g.label < p.dst
)
SELECT e.vec_id, MIN(g.label) AS group_id,
       CAST(CASE WHEN MIN(g.label) = e.vec_id THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM emb e JOIN gr g ON g.id = e.vec_id GROUP BY e.vec_id
"""


def embed_pq_sql(
    m: int = 4, n_codes: int = 8, k: int = 5, shortlist_factor: int = 4,
    seed: int = 42, dim: int = 64, q_max: int = 10,
) -> str:
    """Product-quantization top-k replay (text/pq.pq_topk, one Lloyd
    round): hash-sampled seed vectors sliced into per-subspace codebooks,
    argmin-L2 assignment (squared distance via the SAME left-to-right
    zip fold as the engine), mean recentre, encode, per-query LUT,
    ADC scan ranked on the 6dp-rounded score, exact-cosine rerank."""
    w = dim // m
    ph = phash_sql("vec_id", str(seed))
    l2 = (
        "list_sum(list_transform(list_zip({a}, {b}),"
        " s -> (s[1] - s[2]) * (s[1] - s[2])))"
    )
    ip = "list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]))"
    assign = (
        "SELECT id, sub, code FROM ("
        "SELECT sv.id, sv.sub, b.code, ROW_NUMBER() OVER ("
        "PARTITION BY sv.id, sv.sub "
        f"ORDER BY {l2.format(a='sv.sv', b='b.cv')} ASC, b.code ASC) AS rn "
        "FROM sv JOIN {src} b USING (sub)) t WHERE rn = 1"
    )
    return f"""
WITH sel AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS code, v FROM (
    SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS v, {ph} AS h
    FROM embeddings ORDER BY h, sid LIMIT {n_codes}) s),
b0 AS MATERIALIZED (
  SELECT r.range AS sub, sel.code,
         list_slice(sel.v, r.range * {w} + 1, (r.range + 1) * {w}) AS cv
  FROM sel, range({m}) r),
sv AS MATERIALIZED (
  SELECT e.vec_id AS id, r.range AS sub,
         list_slice(CAST(e.embedding AS DOUBLE[]),
                    r.range * {w} + 1, (r.range + 1) * {w}) AS sv
  FROM embeddings e, range({m}) r),
a0 AS MATERIALIZED ({assign.format(src='b0')}),
mr AS MATERIALIZED (
  SELECT a0.sub, a0.code, r.range AS pos, AVG(sv.sv[r.range + 1]) AS mx
  FROM a0 JOIN sv ON sv.id = a0.id AND sv.sub = a0.sub, range({w}) r
  GROUP BY a0.sub, a0.code, r.range),
b1 AS MATERIALIZED (
  SELECT sub, code, LIST(mx ORDER BY pos) AS cv FROM mr GROUP BY sub, code),
a1 AS MATERIALIZED ({assign.format(src='b1')}),
lut AS MATERIALIZED (
  SELECT q.id AS query_id, b.sub, b.code,
         {ip.format(a='q.sv', b='b.cv')} AS ipv
  FROM sv q JOIN b1 b USING (sub) WHERE q.id < {q_max}),
adc AS MATERIALIZED (
  SELECT l.query_id, a.id, SUM(l.ipv) AS adc
  FROM a1 a JOIN lut l ON l.sub = a.sub AND l.code = a.code
  WHERE a.id <> l.query_id
  GROUP BY l.query_id, a.id),
short AS (
  SELECT query_id, id AS neighbor_id FROM (
    SELECT query_id, id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY ROUND(adc, 6) DESC, id ASC) AS rn
    FROM adc) t WHERE rn <= {k * shortlist_factor}),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(en.embedding AS DOUBLE[])) AS cos
  FROM short s
  JOIN embeddings eq ON eq.vec_id = s.query_id
  JOIN embeddings en ON en.vec_id = s.neighbor_id)
SELECT query_id, neighbor_id, ROUND(cos, 4) AS cos FROM (
  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored) t WHERE rn <= {k}
"""


def embed_ivf_sql(
    n_list: int = 8, n_probe: int = 3, k: int = 5, seed: int = 42,
    dim: int = 64, q_max: int = 10,
) -> str:
    """IVF top-k replay (text/similarity.ivf_cosine_topk, refine_rounds=1):
    seed centroids = the n_list vectors of smallest portable hash; one
    Lloyd round (argmax-cosine assignment, element-wise mean recentre);
    per query probe the n_probe best cells, exact-score their members,
    top-k. Tie-breaks (cell ASC, neighbor ASC) mirror the engine's
    max_by(struct(cos, -cell)) / window orderings."""
    ph = phash_sql("vec_id", str(seed))
    assign = (
        "SELECT vec_id, cell FROM ("
        "SELECT e.vec_id, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id"
        " ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)"
        " DESC, c.cell ASC) AS rn"
        " FROM embeddings e, {src} c) t WHERE rn = 1"
    )
    return f"""
WITH sel AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS cell, cv FROM (
    SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS cv, {ph} AS h
    FROM embeddings ORDER BY h, sid LIMIT {n_list}) s),
a0 AS MATERIALIZED ({assign.format(src='sel')}),
m AS MATERIALIZED (
  SELECT a0.cell, r.range AS pos,
         ROUND(AVG(CAST(e.embedding[r.range + 1] AS DOUBLE)), 12) AS mv
  FROM a0 JOIN embeddings e USING (vec_id), range({dim}) r
  GROUP BY a0.cell, r.range),
c1 AS MATERIALIZED (SELECT cell, LIST(mv ORDER BY pos) AS cv FROM m GROUP BY cell),
a1 AS MATERIALIZED ({assign.format(src='c1')}),
pr AS (
  SELECT query_id, cell FROM (
    SELECT e.vec_id AS query_id, c.cell, ROW_NUMBER() OVER (
      PARTITION BY e.vec_id
      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)
        DESC, c.cell ASC) AS rn
    FROM embeddings e, c1 c WHERE e.vec_id < {q_max}) t WHERE rn <= {n_probe}),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM pr p JOIN a1 a USING (cell) WHERE a.vec_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(en.embedding AS DOUBLE[])) AS cos
  FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id
              JOIN embeddings en ON en.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, ROUND(cos, 4) AS cos FROM (
  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored) t WHERE rn <= {k}
"""


def pathgrow_sql(cte: str, rounds: int = 10) -> str:
    """Path-growing matching replay (algs/matching.path_growing_matching)
    — round-unrolled: every active path head proposes its heaviest edge
    to a still-free vertex (weight DESC, target ASC per walker); a
    proposal is selected iff it is the top-priority proposal (weight
    DESC, src ASC, dst ASC — a global total order) at BOTH endpoints;
    selected edges 2-color alternately per path; return the heavier
    color class with canonical (least, greatest) endpoints. Fully
    deterministic (no hash draws), so a fixed unroll with margin is
    exact: once no head has a free neighbor the state is a fixpoint."""
    parts = [
        "wk0 AS MATERIALIZED (SELECT id AS wid, id AS cur, 0 AS parity FROM nodes)",
        "fr0 AS MATERIALIZED (SELECT id FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"pr{r} AS MATERIALIZED (SELECT wid, parity, u, t, weight FROM ("
            f"SELECT w.wid, w.parity, w.cur AS u, e.dst AS t, e.weight,"
            f" ROW_NUMBER() OVER (PARTITION BY w.wid"
            f" ORDER BY e.weight DESC, e.dst ASC) AS rn"
            f" FROM wk{p} w JOIN sym e ON e.src = w.cur AND e.src <> e.dst"
            f" JOIN fr{p} f ON f.id = e.dst) q WHERE rn = 1)"
        )
        parts.append(
            f"win{r} AS MATERIALIZED (SELECT vertex, u, t FROM ("
            f"SELECT vertex, u, t, ROW_NUMBER() OVER (PARTITION BY vertex"
            f" ORDER BY weight DESC, u ASC, t ASC) AS rn FROM ("
            f"SELECT u AS vertex, u, t, weight FROM pr{r}"
            f" UNION ALL SELECT t AS vertex, u, t, weight FROM pr{r}"
            f") i) q WHERE rn = 1)"
        )
        parts.append(
            f"se{r} AS MATERIALIZED (SELECT p.wid, p.parity, p.u, p.t,"
            f" p.weight FROM pr{r} p"
            f" JOIN win{r} a ON a.vertex = p.u AND a.u = p.u AND a.t = p.t"
            f" JOIN win{r} b ON b.vertex = p.t AND b.u = p.u AND b.t = p.t)"
        )
        parts.append(
            f"wk{r} AS MATERIALIZED ("
            f"SELECT w.wid, w.cur, w.parity FROM wk{p} w"
            f" WHERE w.wid IN (SELECT wid FROM pr{r})"
            f" AND w.wid NOT IN (SELECT wid FROM se{r})"
            f" AND w.cur NOT IN (SELECT t FROM se{r})"
            f" UNION ALL SELECT wid, t AS cur, 1 - parity FROM se{r})"
        )
        parts.append(
            f"fr{r} AS MATERIALIZED (SELECT id FROM fr{p}"
            f" WHERE id NOT IN (SELECT u FROM se{r})"
            f" AND id NOT IN (SELECT t FROM se{r}))"
        )
    union = " UNION ALL ".join(
        f"SELECT u, t, weight, parity FROM se{r}" for r in range(1, rounds + 1)
    )
    return (
        f"WITH {cte},\n" + ",\n".join(parts)
        + f",\nallm AS MATERIALIZED ({union}),\n"
        "tot AS (SELECT COALESCE(SUM(CASE WHEN parity = 0 THEN weight END), 0)"
        " AS w1, COALESCE(SUM(CASE WHEN parity = 1 THEN weight END), 0) AS w2"
        " FROM allm)\n"
        "SELECT LEAST(u, t) AS u, GREATEST(u, t) AS v,"
        " CAST(weight AS DOUBLE) AS weight FROM allm, tot"
        " WHERE parity = (CASE WHEN w1 >= w2 THEN 0 ELSE 1 END)"
    )


def pll_dist_sql(
    cte: str, u_below: int = 10, v_mod: int = 50, hops: int = 12
) -> str:
    """Oracle for doc_pll_dist: full pruned-landmark-labeling queries are
    EXACT hop distances (every vertex is a hub), so the independent replay
    is a plain multi-source BFS from the pair sources — none of the
    engine's pruning machinery is mirrored, which is the point: the index
    construction is validated purely through its query answers."""
    parts = [
        f"m0 AS MATERIALIZED (SELECT id AS u, id AS v, 0 AS dist"
        f" FROM nodes WHERE id < {u_below})"
    ]
    for i in range(1, hops + 1):
        p = i - 1
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT u, v, MIN(dist) AS dist FROM ("
            f"SELECT u, v, dist FROM m{p} UNION ALL "
            f"SELECT m.u, e.dst AS v, m.dist + 1 FROM m{p} m"
            f" JOIN sym e ON e.src = m.v) q GROUP BY u, v)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) + ",\n"
        f"pairs AS (SELECT s.id AS u, t.id AS v FROM nodes s, nodes t"
        f" WHERE s.id < {u_below} AND t.id % {v_mod} = 0 AND s.id <> t.id)\n"
        f"SELECT p.u, p.v, CAST(m.dist AS BIGINT) AS dist FROM pairs p"
        f" LEFT JOIN m{hops} m ON m.u = p.u AND m.v = p.v"
    )


def gedwalk_sql(
    cte: str, k: int = 3, alpha: float = 0.1, max_len: int = 4,
    round_to: int = 6,
) -> str:
    """GedWalk greedy replay (algs/gedwalk.ged_walk with fixed alpha and
    round_to) — per round: in/out walk-count chains over the residual
    graph, through-walk gain in the engine's exact term order (alpha
    powers inlined as repr'd Python doubles so both engines combine
    bit-identical IEEE constants), rounded argmax pick, then the exact
    truncated group score from total-walk chains."""
    L = max_len
    parts = [
        "hn1 AS MATERIALIZED (SELECT id FROM nodes)",
        "h1 AS MATERIALIZED (SELECT src, dst FROM sym WHERE src <> dst)",
        "tg0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS cnt FROM nodes)",
    ]
    for j in range(1, L + 1):
        parts.append(
            f"tg{j} AS MATERIALIZED (SELECT e.src AS id, SUM(c.cnt) AS cnt"
            f" FROM sym e JOIN tg{j-1} c ON c.id = e.dst WHERE e.src <> e.dst"
            f" GROUP BY e.src)"
        )
    selects = []
    for r in range(1, k + 1):
        if r > 1:
            parts.append(
                f"hn{r} AS MATERIALIZED (SELECT id FROM hn{r-1}"
                f" WHERE id NOT IN (SELECT id FROM pk{r-1}))"
            )
            parts.append(
                f"h{r} AS MATERIALIZED (SELECT src, dst FROM h{r-1}"
                f" WHERE src NOT IN (SELECT id FROM pk{r-1})"
                f" AND dst NOT IN (SELECT id FROM pk{r-1}))"
            )
        parts.append(f"i{r}_0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS cnt FROM hn{r})")
        parts.append(f"o{r}_0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS cnt FROM hn{r})")
        for a in range(1, L):
            parts.append(
                f"i{r}_{a} AS MATERIALIZED (SELECT e.dst AS id, SUM(c.cnt) AS"
                f" cnt FROM h{r} e JOIN i{r}_{a-1} c ON c.id = e.src"
                f" GROUP BY e.dst)"
            )
            parts.append(
                f"o{r}_{a} AS MATERIALIZED (SELECT e.src AS id, SUM(c.cnt) AS"
                f" cnt FROM h{r} e JOIN o{r}_{a-1} c ON c.id = e.dst"
                f" GROUP BY e.src)"
            )
        gain = "CAST(0.0 AS DOUBLE)"
        for a in range(L):
            for b in range(L - a):
                gain += (
                    f" + CAST({alpha ** (a + b + 1)!r} AS DOUBLE) *"
                    f" COALESCE(ia{a}.cnt, CAST(0.0 AS DOUBLE)) * COALESCE(ob{b}.cnt, CAST(0.0 AS DOUBLE))"
                )
        joins = "".join(
            f" LEFT JOIN i{r}_{a} ia{a} ON ia{a}.id = n.id" for a in range(L)
        ) + "".join(
            f" LEFT JOIN o{r}_{b} ob{b} ON ob{b}.id = n.id" for b in range(L)
        )
        parts.append(
            f"gn{r} AS MATERIALIZED (SELECT n.id,"
            f" ROUND({gain}, {round_to}) AS gain FROM hn{r} n{joins})"
        )
        parts.append(
            f"pk{r} AS MATERIALIZED (SELECT id, gain FROM ("
            f"SELECT id, gain, ROW_NUMBER() OVER (ORDER BY gain DESC,"
            f" id ASC) AS rn FROM gn{r}) q WHERE rn = 1)"
        )
        parts.append(
            f"hh{r} AS MATERIALIZED (SELECT src, dst FROM h{r}"
            f" WHERE src NOT IN (SELECT id FROM pk{r})"
            f" AND dst NOT IN (SELECT id FROM pk{r}))"
        )
        parts.append(
            f"tc{r}_0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS cnt FROM hn{r}"
            f" WHERE id NOT IN (SELECT id FROM pk{r}))"
        )
        for j in range(1, L + 1):
            parts.append(
                f"tc{r}_{j} AS MATERIALIZED (SELECT e.src AS id, SUM(c.cnt)"
                f" AS cnt FROM hh{r} e JOIN tc{r}_{j-1} c ON c.id = e.dst"
                f" GROUP BY e.src)"
            )
        phi = "CAST(0.0 AS DOUBLE)"
        for j in range(1, L + 1):
            phi += (
                f" + CAST({alpha ** j!r} AS DOUBLE) * ("
                f"COALESCE((SELECT SUM(cnt) FROM tg{j}), CAST(0.0 AS DOUBLE)) -"
                f" COALESCE((SELECT SUM(cnt) FROM tc{r}_{j}), CAST(0.0 AS DOUBLE)))"
            )
        selects.append(
            f"SELECT CAST({r - 1} AS INT) AS ord, id, gain,"
            f" ROUND({phi}, {round_to}) AS ged_score FROM pk{r}"
        )
    return f"WITH {cte},\n" + ",\n".join(parts) + "\n" + " UNION ALL ".join(selects)


def maxent_sql(
    cte: str,
    iters: int = 5,
    alpha: float = 0.02,
    n_anchors: int = 8,
    seed: int = 7,
    round_to: int = 6,
) -> str:
    """MaxentStress replay (algs/maxent.maxent_stress, dims=2, q=2.0) —
    portable md5 init + per-iteration anchor draws, then the exact local
    iteration: per-vertex attraction aggregate over sym (squares as IEEE
    products, sqrt, GREATEST eps clamp) plus the broadcast anchor
    repulsion sample, combined in the engine's term order."""
    eps = repr(1e-9)
    a = repr(alpha)
    init0 = f"(({phash_sql('id', str(seed), '0')}) % 1000000) / 1000000.0"
    init1 = f"(({phash_sql('id', str(seed), '1')}) % 1000000) / 1000000.0"
    parts = [
        f"p0 AS MATERIALIZED (SELECT id, {init0} AS x0, {init1} AS x1 FROM nodes)"
    ]
    for it in range(iters):
        h = phash_sql("id", str(seed), str(1000 + it))
        parts.append(
            f"an{it} AS MATERIALIZED (SELECT id FROM nodes"
            f" ORDER BY {h}, id LIMIT {n_anchors})"
        )
        parts.append(
            f"ap{it} AS MATERIALIZED (SELECT p.id AS aid, p.x0 AS a0,"
            f" p.x1 AS a1 FROM p{it} p JOIN an{it} a ON a.id = p.id)"
        )
        parts.append(
            f"at{it} AS MATERIALIZED (SELECT id, SUM(w) AS wsum,"
            f" SUM(w * (vx0 + w * (ux0 - vx0) / g)) AS s0,"
            f" SUM(w * (vx1 + w * (ux1 - vx1) / g)) AS s1 FROM ("
            f"SELECT e.dst AS id, e.weight AS w, v.x0 AS vx0, v.x1 AS vx1,"
            f" u.x0 AS ux0, u.x1 AS ux1,"
            f" GREATEST(sqrt((u.x0 - v.x0) * (u.x0 - v.x0)"
            f" + (u.x1 - v.x1) * (u.x1 - v.x1)), {eps}) AS g"
            f" FROM sym e JOIN p{it} v ON v.id = e.src"
            f" JOIN p{it} u ON u.id = e.dst WHERE e.src <> e.dst"
            f") t GROUP BY id)"
        )
        parts.append(
            f"rp{it} AS MATERIALIZED (SELECT id, SUM(d0 / (g * g)) AS r0,"
            f" SUM(d1 / (g * g)) AS r1 FROM ("
            f"SELECT p.id, p.x0 - a.a0 AS d0, p.x1 - a.a1 AS d1,"
            f" GREATEST(sqrt((p.x0 - a.a0) * (p.x0 - a.a0)"
            f" + (p.x1 - a.a1) * (p.x1 - a.a1)), {eps}) AS g"
            f" FROM p{it} p, ap{it} a WHERE p.id <> a.aid"
            f") t GROUP BY id)"
        )
        parts.append(
            f"p{it + 1} AS MATERIALIZED (SELECT p.id,"
            f" CASE WHEN t.wsum IS NOT NULL THEN"
            f" (t.s0 + {a} * COALESCE(r.r0, 0.0)) / t.wsum ELSE p.x0 END AS x0,"
            f" CASE WHEN t.wsum IS NOT NULL THEN"
            f" (t.s1 + {a} * COALESCE(r.r1, 0.0)) / t.wsum ELSE p.x1 END AS x1"
            f" FROM p{it} p LEFT JOIN at{it} t ON t.id = p.id"
            f" LEFT JOIN rp{it} r ON r.id = p.id)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts)
        + f"\nSELECT id, ROUND(x0, {round_to}) AS x0,"
        f" ROUND(x1, {round_to}) AS x1 FROM p{iters}"
    )


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup — full replay (centroids → assignment → within-
# cell pairs → closure → keep-low-centroid-cos)
# ---------------------------------------------------------------------------


def semantic_dedup_sql(
    eps: float = 0.05, n_list: int = 8, seed: int = 42,
    dim: int = 64, n_clones: int = 40,
) -> str:
    """text/similarity.semantic_dedup replay (refine_rounds=1, portable
    hash seeds): k-means cells via the IVF quantizer CTEs (same replay as
    embed_ivf_sql), exact within-cell cosine pairs ≥ 1−eps, recursive
    label-min closure into groups, keep = the group member with the
    lowest (ROUND(centroid_cos, 9), vec_id) — the SemDeDup keep-low
    rule. Runs over the planted-clone union (_embed_union_cte) so real
    duplicate groups exist."""
    ph = phash_sql("vec_id", str(seed))
    return f"""
WITH RECURSIVE {_embed_union_cte(n_clones)},
sel AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS cell, cv FROM (
    SELECT vec_id AS sid, v AS cv, {ph} AS h
    FROM emb ORDER BY h, sid LIMIT {n_list}) s),
a0 AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell ASC) AS rn
    FROM emb e, sel c) t WHERE rn = 1),
m AS MATERIALIZED (
  SELECT a0.cell, r.range AS pos, ROUND(AVG(e.v[r.range + 1]), 12) AS mv
  FROM a0 JOIN emb e USING (vec_id), range({dim}) r
  GROUP BY a0.cell, r.range),
c1 AS MATERIALIZED (
  SELECT cell, LIST(mv ORDER BY pos) AS cv FROM m GROUP BY cell),
a1 AS MATERIALIZED (
  SELECT vec_id, cell, ccos FROM (
    SELECT e.vec_id, c.cell, list_cosine_similarity(e.v, c.cv) AS ccos,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell ASC) AS rn
    FROM emb e, c1 c) t WHERE rn = 1),
hits AS MATERIALIZED (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM a1 x JOIN a1 y ON x.cell = y.cell AND x.vec_id < y.vec_id
  JOIN emb ea ON ea.vec_id = x.vec_id JOIN emb eb ON eb.vec_id = y.vec_id
  WHERE list_cosine_similarity(ea.v, eb.v) >= {1.0 - eps}),
pe AS MATERIALIZED (SELECT a AS src, b AS dst FROM hits
                    UNION SELECT b, a FROM hits),
gr(id, label) AS (
  SELECT vec_id, vec_id FROM emb
  UNION
  SELECT p.dst, g.label FROM gr g JOIN pe p ON p.src = g.id
  WHERE g.label < p.dst
),
grp AS MATERIALIZED (
  SELECT e.vec_id, MIN(g.label) AS group_id
  FROM emb e JOIN gr g ON g.id = e.vec_id GROUP BY e.vec_id)
SELECT vec_id, cell, ROUND(ccos, 4) AS centroid_cos, group_id,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM (
  SELECT g.vec_id, a1.cell, a1.ccos, g.group_id,
    ROW_NUMBER() OVER (PARTITION BY g.group_id
      ORDER BY ROUND(a1.ccos, 9) ASC, g.vec_id ASC) AS rn
  FROM grp g JOIN a1 ON a1.vec_id = g.vec_id) t
"""


# ---------------------------------------------------------------------------
# URL admission filter — expression-for-expression replay
# ---------------------------------------------------------------------------


def url_filter_sql(
    pages_glob: str, blocked_hosts: tuple = (), max_len: int = 2048,
    max_query_params: int = 8,
) -> str:
    """text/pipeline.url_filter replay: same pinned rule order, same
    Java∩RE2 regex literals, host lowercased; runs over the committed
    pages fixture UNIONed with the literal edge-case urls the entry
    plants (DuckDB VALUES ≡ Spark createDataFrame)."""
    blocked = ", ".join(f"'{h.lower()}'" for h in blocked_hosts) or "''"
    host_re = r"^https?://([^/:?#]+)"
    bin_re = (
        r"\.(jpe?g|png|gif|bmp|webp|tiff?|css|js|ico|svg|woff2?|ttf|eot"
        r"|mp[34]|m4[av]|avi|mov|mkv|webm|wav|flac|ogg"
        r"|exe|msi|dmg|apk|iso|zip|rar|7z|gz|bz2|xz|tar|pdf)([?#]|$)"
    )
    return f"""
WITH pages AS (SELECT url FROM '{pages_glob}'),
extra(url) AS (VALUES
  ('ftp://files.example.org/x'),
  ('https://' || repeat('a', {max_len + 2}) || '.org/x'),
  ('https:///nopath'),
  ('https://192.168.0.1/admin'),
  ('https://SPAM.example.net/page'),
  ('https://ok.example.org/logo.PNG'),
  ('https://ok.example.org/q?p0=1&p1=1&p2=1&p3=1&p4=1&p5=1&p6=1&p7=1&p8=1&p9=1')),
u AS (SELECT url FROM pages UNION ALL SELECT url FROM extra),
h AS (
  SELECT url,
    LOWER(COALESCE(regexp_extract(url, '{host_re}', 1), '')) AS host,
    LENGTH(url) - LENGTH(REPLACE(url, '&', '')) AS nq
  FROM u),
r AS (
  SELECT url, host,
    CASE
      WHEN NOT regexp_matches(url, '^https?://') THEN 'scheme'
      WHEN LENGTH(url) > {max_len} THEN 'too_long'
      WHEN host = '' THEN 'no_host'
      WHEN regexp_matches(host, '^[0-9.]+$') THEN 'ip_host'
      WHEN host IN ({blocked}) THEN 'blocked_host'
      WHEN regexp_matches(LOWER(url), '{bin_re}') THEN 'binary_ext'
      WHEN nq > {max_query_params} THEN 'query_spam'
    END AS reason
  FROM h)
SELECT url, host, reason,
       CAST(CASE WHEN reason IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM r
"""


def langid_nb_sql(
    n: int = 3, vocab_size: int = 500, alpha: float = 1.0, holdout_mod: int = 5
) -> str:
    """text/langid replay: train multinomial NB char-n-gram language ID on
    the doc_id % holdout_mod != 0 split, classify the held-out split, and
    roll up the confusion matrix. Same normalization (lower + \\s+ collapse
    + trim), same top-V vocabulary tie-break (count DESC, gram ASC), same
    6dp-rounded model values, same (score DESC, lang ASC) argmax as
    linkgraph.text.langid — so predictions (integer counts) match exactly
    while raw scores stay engine-internal floats."""
    a = float(alpha)
    return f"""
WITH norm AS (
  SELECT doc_id, lang, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents),
tr AS (SELECT * FROM norm WHERE doc_id % {holdout_mod} <> 0),
te AS (SELECT * FROM norm WHERE doc_id % {holdout_mod} = 0),
trg AS (
  SELECT lang, UNNEST(list_transform(range(1, greatest(length(t) - {n - 1}, 0) + 1),
                i -> substr(t, i, {n}))) AS gram
  FROM tr),
gc AS (SELECT lang, gram, count(*)::DOUBLE AS c FROM trg GROUP BY 1, 2),
vocab AS (
  SELECT gram FROM (SELECT gram, sum(c) AS tot FROM gc GROUP BY 1)
  ORDER BY tot DESC, gram ASC LIMIT {vocab_size}),
vn AS (SELECT count(*)::DOUBLE AS v FROM vocab),
tl AS (SELECT lang, sum(c) AS t_mass FROM gc JOIN vocab USING (gram) GROUP BY 1),
pri AS (
  SELECT lang, round(ln(count(*) / (SELECT count(*)::DOUBLE FROM tr)), 6) AS prior_lp
  FROM tr GROUP BY 1),
lg AS (
  SELECT tl.lang, prior_lp,
         round(ln({a} / (t_mass + {a} * (v + 1))), 6) AS oov_lp, t_mass, v
  FROM tl JOIN pri USING (lang) CROSS JOIN vn),
model AS (
  SELECT lg.lang, vocab.gram,
         round(ln((coalesce(gc.c, 0) + {a}) / (lg.t_mass + {a} * (lg.v + 1))), 6) AS logp
  FROM lg CROSS JOIN vocab
  LEFT JOIN gc ON gc.lang = lg.lang AND gc.gram = vocab.gram),
teg AS (
  SELECT doc_id, lang AS true_lang,
         list_transform(range(1, greatest(length(t) - {n - 1}, 0) + 1),
                        i -> substr(t, i, {n})) AS gs
  FROM te),
ten AS (SELECT doc_id, true_lang, len(gs)::DOUBLE AS n_grams FROM teg),
tec AS (
  SELECT doc_id, gram, count(*)::DOUBLE AS cnt
  FROM (SELECT doc_id, UNNEST(gs) AS gram FROM teg) GROUP BY 1, 2),
mt AS (
  SELECT tec.doc_id, model.lang,
         sum(tec.cnt * model.logp) AS s_match, sum(tec.cnt) AS c_match
  FROM tec JOIN model USING (gram) GROUP BY 1, 2),
sc AS (
  SELECT ten.doc_id, ten.true_lang, lg.lang,
         lg.prior_lp + coalesce(mt.s_match, 0)
         + (ten.n_grams - coalesce(mt.c_match, 0)) * lg.oov_lp AS score
  FROM ten CROSS JOIN lg
  LEFT JOIN mt ON mt.doc_id = ten.doc_id AND mt.lang = lg.lang),
win AS (
  SELECT doc_id, true_lang, lang AS lang_pred
  FROM sc
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) = 1)
SELECT true_lang, lang_pred, count(*) AS n
FROM win GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Crawl hygiene (linkgraph/crawl.py): URL canonicalization, robots, sitemaps
# ---------------------------------------------------------------------------

# Deterministic literal fixtures shared byte-identically by the Spark
# queries (__spark_entry__) and these DuckDB replays. Hosts align with the
# committed gate_pages fixture (d{0..19}.example.org) so robots admission
# runs over the real crawl URL population.

CRAWL_UA = "linkbot"

CRAWL_CANON_URLS = [
    "HTTPS://Canon.Example.NET:443/A/B?utm_source=x&b=2&a=1#frag",
    "http://canon.example.net:80",
    "http://canon.example.net:8080/a?z=1&y=2",
    "http://u:p@Canon.example.net/x",
    "https://canon.example.net:80/a",
    "http://canon.example.net/a?x=1&&x=1&gclid=z",
    "http://canon.example.net/a/?ref=home",
    "ftp://canon.example.net/x",
    "not a url",
    "http://canon.example.net/dup?utm_c=1",
    "HTTP://CANON.EXAMPLE.NET/dup",
]

CRAWL_ROBOTS = [
    (
        "d0.example.org",
        "# policy\nUser-agent: linkbot\nUser-agent: otherbot\n"
        "Disallow: /p1\nAllow: /p1*\nCrawl-delay: 5\n\n"
        "User-agent: *\nDisallow: /\n",
    ),
    (
        "d1.example.org",
        "User-agent: *\nDisallow: /p2$\nDisallow: /p3*\nAllow: /p33\nDisallow:\n",
    ),
    ("d2.example.org", "User-agent: *\nDisallow: /\nAllow: /p1\n"),
    ("d3.example.org", "Disallow: /orphan\nUser-agent: googlebot\nDisallow: /\n"),
    (
        "d4.example.org",
        "User-agent: *\nAllow: /\nUser-agent: linkbot\nDisallow: /p*0$\n",
    ),
]

CRAWL_ROBOTS_EXTRA_URLS = [
    "https://d1.example.org/p3?sid=9",
    "https://d1.example.org/p2",
    "https://d1.example.org/p2x",
    "https://d1.example.org/p33z",
    "https://d4.example.org/p70",
    "https://d4.example.org/p701",
]

CRAWL_SITEMAPS = [
    (
        "https://d0.example.org/sitemap.xml",
        '<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n'
        "<url><loc> https://d0.example.org/p1?a=1&amp;b=2 </loc>"
        "<lastmod>2026-01-05</lastmod></url>\n"
        "<url><loc>https://d0.example.org/p2</loc></url>\n"
        "<url><lastmod>2026-01-06</lastmod></url>\n</urlset>",
    ),
    (
        "https://d1.example.org/sitemap_index.xml",
        "<sitemapindex><sitemap><loc>https://d1.example.org/sm/a.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>\n"
        "<sitemap><loc>https://d1.example.org/sm/b.xml</loc></sitemap>"
        "</sitemapindex>",
    ),
    (
        "https://d2.example.org/sitemap.xml",
        "<urlset><url><loc>https://d2.example.org/x&#39;y&quot;&lt;&gt;</loc></url>\n"
        "<url>\n<loc>\nhttps://d2.example.org/multi\nline\n</loc>\n</url></urlset>",
    ),
]


def _sq(s: str) -> str:
    """SQL single-quoted literal (embedded newlines stay literal)."""
    return "'" + s.replace("'", "''") + "'"


def _canon_expr(url: str) -> str:
    """DuckDB expression replaying linkgraph.crawl.canonicalize_url
    (sort_query=True, strip_trailing_slash=False) over column ``url``."""
    scheme_re = "'^([A-Za-z][A-Za-z0-9+.\\-]*)://'"
    return f"""(
  SELECT CASE WHEN scheme IN ('http','https') AND hostport2 <> '' THEN
    scheme || '://' || userinfo || hostport2 || path2 ||
    (CASE WHEN qstr <> '' THEN '?' || qstr ELSE '' END)
  END FROM (
    SELECT scheme, userinfo, path2, hostport2,
      array_to_string(list_sort(list_filter(string_split(query, '&'),
        p -> p <> ''
         AND NOT starts_with(lower(regexp_extract(p, '^([^=]*)', 1)), 'utm_')
         AND lower(regexp_extract(p, '^([^=]*)', 1)) NOT IN
             ('gclid','fbclid','msclkid','mc_eid','igshid','ref','ref_src'))),
        '&') AS qstr
    FROM (
      SELECT scheme, userinfo,
        CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
               THEN regexp_replace(hostport, ':80$', '')
             WHEN scheme = 'https' AND hostport LIKE '%:443'
               THEN regexp_replace(hostport, ':443$', '')
             ELSE hostport END AS hostport2,
        CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path2,
        CASE WHEN contains(path_query, '?')
             THEN regexp_replace(path_query, '^[^?]*\\?', '')
             ELSE '' END AS query
      FROM (
        SELECT scheme,
          regexp_extract(authority, '^([^@]*@)', 1) AS userinfo,
          lower(regexp_replace(authority, '^[^@]*@', '')) AS hostport,
          regexp_extract(path_query, '^([^?]*)', 1) AS path0, path_query
        FROM (
          SELECT lower(regexp_extract(no_frag, {scheme_re}, 1)) AS scheme,
            regexp_extract(rest, '^([^/?]*)', 1) AS authority,
            substr(rest, length(regexp_extract(rest, '^([^/?]*)', 1)) + 1)
              AS path_query, rest
          FROM (SELECT regexp_replace({url}, '#.*$', '') AS no_frag,
                       regexp_replace(regexp_replace({url}, '#.*$', ''),
                                      {scheme_re}, '') AS rest)
        )
      )
    )
  )
)"""


def url_canonical_sql(pages_glob: str) -> str:
    """canonical_duplicates over gate_pages urls ∪ the literal adversarial
    set — full RFC 3986 §6 canonicalization replayed in DuckDB."""
    vals = ", ".join(f"({_sq(u)})" for u in CRAWL_CANON_URLS)
    return f"""
WITH urlsrc(url) AS (
  SELECT url FROM read_parquet('{pages_glob}')
  UNION ALL SELECT * FROM (VALUES {vals})
),
canon AS (
  SELECT url, COALESCE({_canon_expr('url')}, url) AS canonical_url FROM urlsrc
),
reps AS (SELECT canonical_url, MIN(url) AS rep FROM canon GROUP BY 1)
SELECT c.url, c.canonical_url,
       CASE WHEN c.url = r.rep THEN 1 ELSE 0 END AS keep
FROM canon c JOIN reps r USING (canonical_url)
"""


def robots_admission_sql(pages_glob: str, user_agent: str = CRAWL_UA) -> str:
    """RFC 9309 parse + longest-match admission replayed in DuckDB over
    the same literal robots corpus and the gate_pages URL population."""
    rvals = ", ".join(f"({_sq(h)}, {_sq(t)})" for h, t in CRAWL_ROBOTS)
    uvals = ", ".join(f"({_sq(u)})" for u in CRAWL_ROBOTS_EXTRA_URLS)
    ua = _sq(user_agent.lower())
    return f"""
WITH robots(host, txt) AS (VALUES {rvals}),
urlsrc(url) AS (
  SELECT url FROM read_parquet('{pages_glob}')
  UNION ALL SELECT * FROM (VALUES {uvals})
),
lines AS (
  SELECT host,
    unnest(generate_series(1, len(string_split(txt, chr(10))))) AS pos,
    unnest(string_split(txt, chr(10))) AS raw
  FROM robots
),
parsed AS (
  SELECT host, pos, line,
    lower(regexp_extract(line, '^([A-Za-z\\-]+)\\s*:', 1)) AS field,
    trim(regexp_replace(line, '^[A-Za-z\\-]+\\s*:', '')) AS value
  FROM (SELECT host, pos, trim(regexp_replace(raw, '#.*$', '')) AS line FROM lines)
  WHERE line <> ''
),
kept AS (
  SELECT host, pos, field, value,
    CASE WHEN field = 'user-agent' THEN 1 ELSE 0 END AS is_ua
  FROM parsed WHERE field IN ('user-agent', 'allow', 'disallow')
),
marks AS (
  SELECT *, CASE WHEN is_ua = 1 AND COALESCE(
      LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), 0) = 0
    THEN 1 ELSE 0 END AS ua_start
  FROM kept
),
grp AS (
  SELECT *, SUM(ua_start) OVER (PARTITION BY host ORDER BY pos) AS group_id
  FROM marks
),
agents AS (
  SELECT DISTINCT host, group_id, lower(value) AS agent
  FROM grp WHERE is_ua = 1 AND group_id > 0
),
rul AS (
  SELECT DISTINCT r.host, a.agent, r.field AS rule, r.value AS pattern,
         length(r.value) AS pattern_len
  FROM grp r JOIN agents a ON a.host = r.host AND a.group_id = r.group_id
  WHERE r.is_ua = 0 AND r.group_id > 0 AND r.value <> ''
),
cand AS (
  SELECT host, rule, pattern, pattern_len,
    CASE WHEN agent = {ua} THEN 1 ELSE 0 END AS is_mine
  FROM rul WHERE agent IN ({ua}, '*')
),
pick AS (
  SELECT host, rule, pattern, pattern_len,
    (CASE WHEN pattern LIKE '%$' THEN esc
          ELSE esc || '%' END) AS lk
  FROM (
    SELECT *, replace(replace(replace(replace(
        CASE WHEN pattern LIKE '%$'
             THEN regexp_replace(pattern, '\\$$', '') ELSE pattern END,
        '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%') AS esc
    FROM (SELECT *, MAX(is_mine) OVER (PARTITION BY host) AS has_mine FROM cand)
    WHERE is_mine = has_mine
  )
),
u AS (
  SELECT url, lower(regexp_extract(url, '^(?i:https?)://([^/:?#]+)', 1)) AS host,
    (CASE WHEN p = '' THEN '/' ELSE p END) ||
    (CASE WHEN contains(pre, '?')
          THEN '?' || regexp_extract(pre, '\\?(.*)', 1) ELSE '' END) AS path
  FROM (SELECT url, split_part(url, '#', 1) AS pre,
          regexp_extract(split_part(url, '#', 1),
                         '^(?i:https?)://[^/?#]+(/[^?#]*)', 1) AS p
        FROM urlsrc)
),
m AS (
  SELECT u.url, u.host, r.rule, r.pattern,
    (r.lk IS NOT NULL AND u.path LIKE r.lk ESCAPE '\\') AS hit,
    CASE WHEN (r.lk IS NOT NULL AND u.path LIKE r.lk ESCAPE '\\') THEN
      lpad(CAST(r.pattern_len AS VARCHAR), 6, '0') ||
      (CASE WHEN r.rule = 'allow' THEN '1' ELSE '0' END) || '|' || r.pattern
    END AS key
  FROM u LEFT JOIN pick r ON u.host = r.host
),
ranked AS (
  SELECT url, host, rule, pattern,
    ROW_NUMBER() OVER (PARTITION BY url ORDER BY key DESC NULLS LAST) AS rn,
    MAX(CASE WHEN hit THEN 1 ELSE 0 END) OVER (PARTITION BY url) AS any_hit
  FROM m
)
SELECT url, host,
  CASE WHEN any_hit = 1 THEN rule END AS matched_rule,
  CASE WHEN any_hit = 1 THEN pattern END AS matched_pattern,
  CASE WHEN any_hit = 1 THEN
    (CASE WHEN rule = 'allow' THEN 1 ELSE 0 END) ELSE 1 END AS allowed
FROM ranked WHERE rn = 1
"""


def sitemap_locs_sql() -> str:
    """sitemaps.org extraction replayed in DuckDB over the literal corpus."""
    vals = ", ".join(f"({_sq(u)}, {_sq(x)})" for u, x in CRAWL_SITEMAPS)
    return f"""
WITH sm(url, xml) AS (VALUES {vals}),
blocks AS (
  SELECT url,
    CASE WHEN contains(xml, '<sitemapindex') THEN 'index' ELSE 'urlset' END AS kind,
    unnest(regexp_extract_all(xml,
      '(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)) AS b
  FROM sm
),
entries AS (
  SELECT url AS sitemap_url, kind,
    trim(regexp_extract(b, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)) AS loc_raw,
    trim(regexp_extract(b, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)) AS lastmod_raw
  FROM blocks
)
SELECT sitemap_url, kind,
  replace(replace(replace(replace(replace(loc_raw,
    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
    '&amp;', '&') AS loc,
  CASE WHEN lastmod_raw <> '' THEN lastmod_raw END AS lastmod
FROM entries WHERE loc_raw <> ''
"""


def warc_pages_sql(warc_file: str) -> str:
    """Fast-path WARC parse replayed in DuckDB: read_text → split on the
    record magic → regexp header/body extraction (same trailing-CRLF-run
    strip contract as linkgraph.warc.read_warc)."""
    return f"""
WITH f AS (SELECT content FROM read_text('{warc_file}')),
recs AS (
  SELECT unnest(string_split(content, 'WARC/1.0' || chr(13) || chr(10))) AS rec
  FROM f
),
good AS (
  SELECT rec FROM recs
  WHERE contains(rec, chr(13) || chr(10) || chr(13) || chr(10))
),
parsed AS (
  -- header fields come from the pre-blank-line HEADER BLOCK only,
  -- mirroring the engine's payload-spoof guard (warc.py::_header)
  SELECT
    nullif(regexp_extract(hdr, '(?im)^WARC-Target-URI:\\s*(\\S+)', 1), '') AS url,
    nullif(regexp_extract(hdr, '(?im)^WARC-Type:\\s*(\\S+)', 1), '') AS warc_type,
    nullif(regexp_extract(hdr, '(?im)^WARC-Date:\\s*(\\S+)', 1), '') AS warc_date,
    regexp_replace(rec, '(?s)^.*?\\r\\n\\r\\n', '') AS payload
  FROM (SELECT rec,
               split_part(rec, chr(13) || chr(10) || chr(13) || chr(10), 1) AS hdr
        FROM good) g
),
body AS (
  SELECT url, warc_type, warc_date,
    CASE WHEN starts_with(payload, 'HTTP/')
      THEN TRY_CAST(regexp_extract(payload, '^HTTP/[0-9.]+\\s+([0-9]+)', 1) AS INT)
    END AS http_status,
    regexp_replace(
      CASE WHEN starts_with(payload, 'HTTP/')
           THEN regexp_replace(payload, '(?s)^.*?\\r\\n\\r\\n', '')
           ELSE payload END,
      '(?s)(\\r\\n|\\n)+$', '') AS html
  FROM parsed
)
SELECT url, warc_type, warc_date, http_status,
       length(html) AS html_len, md5(html) AS html_md5
FROM body
"""


# ---------------------------------------------------------------------------
# Luby maximal independent set — unrolled rounds with portable priorities
# ---------------------------------------------------------------------------


def luby_sql(cte: str, rounds: int = 8, seed: int = 42) -> str:
    """Replay linkgraph.algs.independentset.luby_rounds_fixed exactly:
    per-round priorities are the portable hash phash(id, seed, round);
    the engine's strict lexicographic (priority, id) struct-max tie-break
    is reproduced as a two-stage max (max priority, then max id among
    neighbors at that priority)."""
    parts = [
        "symn AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym WHERE src <> dst)",
        "ms0 AS MATERIALIZED (SELECT id, 0 AS st FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        pri = phash_sql("id", str(seed), str(i))
        parts.append(
            f"mu{i} AS MATERIALIZED (SELECT id, {pri} AS pri FROM ms{p} WHERE st = 0)"
        )
        parts.append(
            f"mr{i} AS MATERIALIZED (SELECT e.src AS id, MAX(q.pri) AS mp "
            f"FROM symn e JOIN mu{i} s ON s.id = e.src "
            f"JOIN mu{i} q ON q.id = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"mr2{i} AS MATERIALIZED (SELECT e.src AS id, r.mp, MAX(e.dst) AS mid "
            f"FROM symn e JOIN mu{i} q ON q.id = e.dst "
            f"JOIN mr{i} r ON r.id = e.src AND q.pri = r.mp GROUP BY e.src, r.mp)"
        )
        parts.append(
            f"mw{i} AS MATERIALIZED (SELECT u.id FROM mu{i} u "
            f"LEFT JOIN mr2{i} r ON r.id = u.id "
            f"WHERE r.id IS NULL OR u.pri > r.mp OR (u.pri = r.mp AND u.id > r.mid))"
        )
        parts.append(
            f"mx{i} AS MATERIALIZED (SELECT DISTINCT e.dst AS id FROM symn e "
            f"JOIN mw{i} w ON w.id = e.src JOIN mu{i} u ON u.id = e.dst "
            f"WHERE e.dst NOT IN (SELECT id FROM mw{i}))"
        )
        parts.append(
            f"ms{i} AS MATERIALIZED (SELECT s.id, "
            f"CASE WHEN w.id IS NOT NULL THEN 1 WHEN x.id IS NOT NULL THEN 2 "
            f"ELSE s.st END AS st FROM ms{p} s "
            f"LEFT JOIN mw{i} w ON w.id = s.id LEFT JOIN mx{i} x ON x.id = s.id)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT id, CASE WHEN st = 1 THEN 1 ELSE 0 END AS in_mis, "
        f"CASE WHEN st = 0 THEN 1 ELSE 0 END AS undecided FROM ms{rounds}"
    )


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi segmentation — SQL-derived vocab + lattice DP unroll
# ---------------------------------------------------------------------------


def unigram_sql(
    mod: int = 50, top_multi: int = 60, max_wlen: int = 12
) -> str:
    """Replay __spark_entry__.doc_unigram_pieces: vocabulary = every
    single character + the top-``top_multi`` substrings (length 2-4,
    ties piece-asc) over the distinct words (length 3..``max_wlen``) of
    the doc_id%``mod`` subset; piece cost = ROUND(-ln(cnt/total), 6);
    segmentation = min-NLL Viterbi with the engine's pinned tie-break
    (smallest split point at equal cost). The DP runs as ``max_wlen``
    Bellman-Ford rounds over the position lattice, then backpointers
    (min start at exact dp equality — doubles are bit-identical because
    both engines accumulate path sums left-to-right) rebuild the pieces
    in ``max_wlen`` reverse rounds."""
    sub_sel = "\n  UNION ALL ".join(
        f"SELECT word, i, substr(word, i, {p}) AS piece "
        f"FROM w0, unnest(generate_series(1, length(word) - {p - 1})) AS g(i)"
        for p in range(1, 5)
    )
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT DISTINCT w AS word
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
        FROM documents WHERE doc_id % {mod} = 0)
  WHERE length(w) BETWEEN 3 AND {max_wlen})""",
        f"subs AS MATERIALIZED (SELECT piece FROM ({sub_sel}))",
        "cnts AS MATERIALIZED (SELECT piece, count(*) AS cnt FROM subs GROUP BY piece)",
        f"""vocab AS MATERIALIZED (
  SELECT piece, cnt FROM cnts WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS rn
    FROM cnts WHERE length(piece) >= 2) t WHERE rn <= {top_multi})""",
        "model AS MATERIALIZED (SELECT piece, "
        "ROUND(-ln(cnt / (SELECT SUM(cnt) * 1.0 FROM vocab)), 6) AS nll FROM vocab)",
        f"""arcs AS MATERIALIZED (
  SELECT s.word, s.i - 1 AS i, s.i - 1 + length(s.piece) AS j, m.nll
  FROM ({sub_sel}) s JOIN model m ON m.piece = s.piece)""",
        "vd0 AS MATERIALIZED (SELECT word, 0 AS pos, CAST(0 AS DOUBLE) AS nll FROM w0)",
    ]
    for r in range(1, max_wlen + 1):
        parts.append(
            f"vd{r} AS MATERIALIZED (SELECT word, pos, MIN(nll) AS nll FROM ("
            f"SELECT word, pos, nll FROM vd{r - 1} UNION ALL "
            f"SELECT a.word, a.j AS pos, d.nll + a.nll FROM vd{r - 1} d "
            f"JOIN arcs a ON a.word = d.word AND a.i = d.pos) u GROUP BY word, pos)"
        )
    parts.append(
        f"bp AS MATERIALIZED (SELECT a.word, a.j, MIN(a.i) AS i FROM arcs a "
        f"JOIN vd{max_wlen} di ON di.word = a.word AND di.pos = a.i "
        f"JOIN vd{max_wlen} dj ON dj.word = a.word AND dj.pos = a.j "
        f"WHERE di.nll + a.nll = dj.nll GROUP BY a.word, a.j)"
    )
    parts.append(
        "sg0 AS MATERIALIZED (SELECT word, length(word) AS pos, '' AS seg FROM w0)"
    )
    for r in range(1, max_wlen + 1):
        parts.append(
            f"sg{r} AS MATERIALIZED ("
            f"SELECT word, pos, seg FROM sg{r - 1} WHERE pos = 0 "
            f"UNION ALL SELECT p.word, b.i AS pos, "
            f"substr(p.word, b.i + 1, p.pos - b.i) || "
            f"CASE WHEN p.seg = '' THEN '' ELSE '|' END || p.seg AS seg "
            f"FROM sg{r - 1} p JOIN bp b ON b.word = p.word AND b.j = p.pos "
            f"WHERE p.pos > 0)"
        )
    return (
        "WITH " + ",\n".join(parts) +
        f"\nSELECT word, CAST(length(seg) - length(replace(seg, '|', '')) + 1 AS BIGINT)"
        f" AS n_pieces, seg FROM sg{max_wlen}"
    )


# ---------------------------------------------------------------------------
# WordPiece greedy longest-match — SQL-derived vocab + pointer-walk unroll
# ---------------------------------------------------------------------------


def wordpiece_sql(
    mod: int = 10, top_multi: int = 60, max_wlen: int = 12
) -> str:
    """Replay __spark_entry__.doc_wordpiece_pieces: the same substring
    vocabulary as unigram_sql (every char + top-``top_multi`` length-2..4
    substrings, ties piece-asc), every piece usable initially AND as a
    ##-continuation; segmentation = greedy longest-match-first, one
    pointer step per unrolled round (non-DP, so the walk is exact —
    longest match via a per-(word,pos) MAX over matching piece lengths)."""
    sub_sel = "\n  UNION ALL ".join(
        f"SELECT word, i, substr(word, i, {p}) AS piece "
        f"FROM w0, unnest(generate_series(1, length(word) - {p - 1})) AS g(i)"
        for p in range(1, 5)
    )
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT DISTINCT w AS word
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
        FROM documents WHERE doc_id % {mod} = 0)
  WHERE length(w) BETWEEN 3 AND {max_wlen})""",
        f"subs AS MATERIALIZED (SELECT piece FROM ({sub_sel}))",
        "cnts AS MATERIALIZED (SELECT piece, count(*) AS cnt FROM subs GROUP BY piece)",
        f"""vocab AS MATERIALIZED (
  SELECT piece FROM cnts WHERE length(piece) = 1
  UNION ALL
  SELECT piece FROM (
    SELECT piece, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS rn
    FROM cnts WHERE length(piece) >= 2) t WHERE rn <= {top_multi})""",
        "gw0 AS MATERIALIZED (SELECT word, 1 AS pos, '' AS seg FROM w0)",
    ]
    for r in range(1, max_wlen + 1):
        parts.append(
            f"gc{r} AS MATERIALIZED (SELECT g.word, g.pos, g.seg, "
            f"MAX(length(v.piece)) AS ln FROM gw{r - 1} g "
            f"JOIN vocab v ON v.piece = substr(g.word, g.pos, length(v.piece)) "
            f"AND g.pos + length(v.piece) - 1 <= length(g.word) "
            f"WHERE g.pos <= length(g.word) GROUP BY g.word, g.pos, g.seg)"
        )
        parts.append(
            f"gw{r} AS MATERIALIZED ("
            f"SELECT word, pos, seg FROM gw{r - 1} WHERE pos > length(word) "
            f"UNION ALL SELECT c.word, c.pos + c.ln, "
            f"c.seg || CASE WHEN c.seg = '' THEN '' ELSE '|' END || "
            f"CASE WHEN c.pos > 1 THEN '##' ELSE '' END || "
            f"substr(c.word, c.pos, c.ln) AS seg FROM gc{r} c)"
        )
    return (
        "WITH " + ",\n".join(parts) +
        f"\nSELECT word, CAST(length(seg) - length(replace(seg, '|', '')) + 1 AS BIGINT)"
        f" AS n_pieces, seg FROM gw{max_wlen}"
    )


# ---------------------------------------------------------------------------
# Seeded label propagation — first-arrival unroll with portable ties
# ---------------------------------------------------------------------------


def seeded_lp_sql(cte: str, rounds: int = 12, mod: int = 50, nlab: int = 3) -> str:
    """Replay algs/seededlp.seeded_label_propagation (portable mode):
    seeds = id%mod==0 labeled id%nlab; per round, still-unlabeled
    vertices adopt the weight-majority label among labeled neighbors
    (ties: max weight, then max phash(dst,label), then max label) and
    LOCK. First-arrival is monotone, so a fixed unroll ≥ seed
    eccentricity is exact."""
    parts = [
        "symn AS MATERIALIZED (SELECT src, dst, weight FROM sym WHERE src <> dst)",
        f"sl0 AS MATERIALIZED (SELECT id, CASE WHEN id % {mod} = 0 "
        f"THEN id % {nlab} END AS label FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        tie = phash_sql("dst", "label")
        parts.append(
            f"sv{i} AS MATERIALIZED (SELECT v.dst, s.label, SUM(v.weight) AS w "
            f"FROM symn v "
            f"JOIN sl{p} su ON su.id = v.dst AND su.label IS NULL "
            f"JOIN sl{p} s ON s.id = v.src AND s.label IS NOT NULL "
            f"GROUP BY v.dst, s.label)"
        )
        parts.append(
            f"sw{i} AS MATERIALIZED (SELECT dst, label FROM ("
            f"SELECT dst, label, ROW_NUMBER() OVER (PARTITION BY dst "
            f"ORDER BY w DESC, {tie} DESC, label DESC) AS rn "
            f"FROM sv{i}) t WHERE rn = 1)"
        )
        parts.append(
            f"sl{i} AS MATERIALIZED (SELECT s.id, "
            f"COALESCE(s.label, w.label) AS label FROM sl{p} s "
            f"LEFT JOIN sw{i} w ON w.dst = s.id)"
        )
    return (
        f"WITH {cte},\n" + ",\n".join(parts) +
        f"\nSELECT id, label FROM sl{rounds}"
    )
