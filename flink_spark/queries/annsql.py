"""DuckDB oracle SQL generators for the iterative ANN/clustering family.

The r8 verdict asked whether the DuckDB side can reproduce the
deterministic Lloyd's iteration the way the LSH hyperplanes were
reproduced verbatim (queries/llm_suite.py llm_lsh_topk). It can: the
repo's k-means (flink_spark/llm/clustering.py) is deterministic end to
end — id-ordered init, sequential-fold distances (Spark ``aggregate``
with 0.0 init == DuckDB ``list_reduce``'s first-element start, bitwise),
tie-break toward the lowest cluster index, 9-digit-rounded mean updates
(damping the engine-specific SUM reduce order), empty clusters keeping
their previous centroid — and the iteration count is FIXED, so the loop
unrolls into a chain of plain CTEs: assign_t = argmin join against
c_{t-1}, means_t = round(avg) group-by, c_t = coalesce(means_t, c_{t-1}).

These generators emit that unrolled SQL for the four previously
rows-only queries (llm_ivf_topk, llm_pq_topk, pipe_kmeans_clusters,
pipe_semantic_neardup), turning them into exact value-hash gates.
Verified exact vs the Spark plans at sf0.001 and sf0.01.

Reference parity: VECTOR_SEARCH index family
(StreamExecVectorSearchTableFunction); FAISS IVF/PQ layouts.
"""

from __future__ import annotations

DIM = 64  # embeddings.embedding is FLOAT[64] in the test corpus


def _dist(v: str, cent: str, dim: int = DIM) -> str:
    """Sequential-fold squared L2 — same order as the Spark plan's
    zip_with+aggregate fold, so the doubles are bitwise equal."""
    return (f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> ({v}[i] - {cent}[i]) * ({v}[i] - {cent}[i])), "
            f"(x, y) -> x + y)")


def _dot(a: str, b: str, dim: int = DIM) -> str:
    return (f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)")


def _cos(a: str, b: str, dim: int = DIM) -> str:
    return (f"{_dot(a, b, dim)} / (sqrt({_dot(a, a, dim)}) "
            f"* sqrt({_dot(b, b, dim)}))")


def _kmeans_ctes(base: str, k: int, n_iter: int, dim: int = DIM) -> str:
    """CTE chain ``c0 .. c{n_iter}`` reproducing clustering.kmeans over a
    CTE ``{base}(id, v)`` (v already element-cast to DOUBLE): id-ordered
    init, per-iteration argmin assignment (ties -> lowest cell) and
    round-9 mean update, empty cells keeping the previous centroid."""
    parts = [f"""
c0 AS (SELECT (ROW_NUMBER() OVER (ORDER BY id)) - 1 AS cell, v AS cent
       FROM (SELECT id, v FROM {base} ORDER BY id LIMIT {k}))"""]
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        parts.append(f"""
a{it} AS (SELECT id, v, cell FROM (
    SELECT b.id, b.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.id
                              ORDER BY {_dist('b.v', 'c.cent', dim)},
                                       c.cell) AS rn
    FROM {base} b, {prev} c) WHERE rn = 1),
m{it} AS (SELECT cell, i AS dim, round(avg(v[i]), 9) AS m
          FROM a{it}, range(1, {dim + 1}) t{it}(i)
          GROUP BY cell, i),
c{it} AS (SELECT p.cell, COALESCE(n.cent, p.cent) AS cent
          FROM {prev} p LEFT JOIN
               (SELECT cell, list(m ORDER BY dim) AS cent
                FROM m{it} GROUP BY cell) n USING (cell))""")
    return ",".join(parts)


def ivf_topk_oracle(k: int = 5, n_centroids: int = 8, n_probe: int = 2,
                    n_assign: int = 1, n_iter: int = 3,
                    dim: int = DIM) -> str:
    """Oracle for similarity.ivf_topk over the sf test slice (queries
    vec_id<10, candidates >=10): unrolled Lloyd's cells, candidates
    assigned to their n_assign nearest cells, queries probing n_probe
    cells, in-cell cosine top-k with (cos DESC, cand_id) tie-break."""
    fin = f"c{n_iter}"
    return f"""WITH
kb AS (SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
       FROM embeddings WHERE vec_id >= 10),
qy AS (SELECT vec_id AS query_id,
              list_transform(embedding, x -> x::DOUBLE) AS qv
       FROM embeddings WHERE vec_id < 10),
{_kmeans_ctes('kb', n_centroids, n_iter, dim)},
asg AS (SELECT id AS cand_id, v, cell FROM (
    SELECT b.id, b.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.id
                              ORDER BY {_dist('b.v', 'c.cent', dim)},
                                       c.cell) AS rn
    FROM kb b, {fin} c) WHERE rn <= {max(1, n_assign)}),
prb AS (SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_dist('q.qv', 'c.cent', dim)},
                                       c.cell) AS rn
    FROM qy q, {fin} c) WHERE rn <= {n_probe}),
pairs AS (SELECT DISTINCT p.query_id, a.cand_id
          FROM prb p JOIN asg a USING (cell)),
scored AS (SELECT pr.query_id, pr.cand_id,
                  {_cos('q.qv', 'c.v', dim)} AS cos_sim
           FROM pairs pr JOIN qy q USING (query_id)
                         JOIN kb c ON c.id = pr.cand_id)
SELECT query_id, cand_id, round(cos_sim, 12) AS cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id) AS rank
  FROM scored) t
WHERE rank <= {k}"""


def kmeans_assign_oracle(k: int = 8, n_iter: int = 5,
                         dim: int = DIM) -> str:
    """Oracle for pipe_kmeans_clusters: full-corpus Lloyd's, emitting the
    final (vec_id, cluster, dist_sq). dist_sq is the same sequential fold
    as the Spark plan — bitwise-equal doubles, no rounding needed."""
    fin = f"c{n_iter}"
    return f"""WITH
kb AS (SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
       FROM embeddings),
{_kmeans_ctes('kb', k, n_iter, dim)}
SELECT id AS vec_id, cell AS cluster, d AS dist_sq FROM (
    SELECT b.id, c.cell, {_dist('b.v', 'c.cent', dim)} AS d,
           ROW_NUMBER() OVER (PARTITION BY b.id
                              ORDER BY {_dist('b.v', 'c.cent', dim)},
                                       c.cell) AS rn
    FROM kb b, {fin} c) t WHERE rn = 1"""


def semantic_neardup_oracle(k: int = 8, n_iter: int = 3, n_probe: int = 2,
                            threshold: float = 0.35, id_max: int = 250,
                            dim: int = DIM) -> str:
    """Oracle for pipe_semantic_neardup (SemDeDup-style): Lloyd's cells
    over the vec_id<{id_max} slice, each vector multi-probed into its
    n_probe nearest cells, in-cell pairs (id_a < id_b, deduped) scored
    by cosine and thresholded."""
    fin = f"c{n_iter}"
    return f"""WITH
kb AS (SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
       FROM embeddings WHERE vec_id < {id_max}),
{_kmeans_ctes('kb', k, n_iter, dim)},
prb AS (SELECT id, v, cell FROM (
    SELECT b.id, b.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.id
                              ORDER BY {_dist('b.v', 'c.cent', dim)},
                                       c.cell) AS rn
    FROM kb b, {fin} c) WHERE rn <= {n_probe}),
pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM prb a JOIN prb b ON a.cell = b.cell AND a.id < b.id),
scored AS (SELECT p.id_a, p.id_b,
                  round({_cos('va.v', 'vb.v', dim)}, 12) AS cos_sim
           FROM pairs p JOIN kb va ON va.id = p.id_a
                        JOIN kb vb ON vb.id = p.id_b)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {threshold}"""


def pq_topk_oracle(k: int = 5, m: int = 16, ks: int = 16, n_iter: int = 3,
                   train_limit: int = 50_000, dim: int = DIM,
                   train_where: str = "",
                   shortlist: int | None = None) -> str:
    """Oracle for similarity.pq_topk: per-subspace codebooks from the
    joint Lloyd's over the md5(cand_id)-ordered training sample
    (pq_train: id-ordered init, first-occurrence argmin ties, round-9
    means, empty codes keep their centroid), map-only encoding of every
    candidate, asymmetric cosine against the codebook reconstruction,
    shortlist of 30·k per query (pq_topk's rows-independent default —
    r10: the former 8%-of-corpus term required a corpus count; pass
    ``shortlist`` to pin a different width on both sides), exact
    rerank."""
    if shortlist is None:
        shortlist = 30 * k
    sub = dim // m
    sd = _dist("s.sv", "p.cent", sub)
    parts = [f"""
kb AS (SELECT vec_id AS cand_id,
              list_transform(embedding, x -> x::DOUBLE) AS v
       FROM embeddings WHERE vec_id >= 10),
qy AS (SELECT vec_id AS query_id,
              list_transform(embedding, x -> x::DOUBLE) AS qv
       FROM embeddings WHERE vec_id < 10),
smp AS (SELECT cand_id, v FROM kb {train_where}
        ORDER BY md5(CAST(cand_id AS VARCHAR)), cand_id
        LIMIT {train_limit}),
sv AS (SELECT cand_id, j,
              list_slice(v, j * {sub} + 1, (j + 1) * {sub}) AS sv
       FROM smp, range(0, {m}) tj(j)),
ini AS (SELECT cand_id FROM smp ORDER BY cand_id LIMIT {ks}),
k0 AS (SELECT s.j,
              (ROW_NUMBER() OVER (PARTITION BY s.j ORDER BY s.cand_id)) - 1
                  AS code,
              s.sv AS cent
       FROM sv s JOIN ini USING (cand_id))"""]
    for it in range(1, n_iter + 1):
        prev = f"k{it - 1}"
        parts.append(f"""
pa{it} AS (SELECT cand_id, j, sv, code FROM (
    SELECT s.cand_id, s.j, s.sv, p.code,
           ROW_NUMBER() OVER (PARTITION BY s.cand_id, s.j
                              ORDER BY {sd}, p.code) AS rn
    FROM sv s JOIN {prev} p USING (j)) WHERE rn = 1),
pm{it} AS (SELECT j, code, i AS dim, round(avg(sv[i]), 9) AS mu
           FROM pa{it}, range(1, {sub + 1}) ti{it}(i)
           GROUP BY j, code, i),
k{it} AS (SELECT p.j, p.code, COALESCE(n.cent, p.cent) AS cent
          FROM {prev} p LEFT JOIN
               (SELECT j, code, list(mu ORDER BY dim) AS cent
                FROM pm{it} GROUP BY j, code) n USING (j, code))""")
    fin = f"k{n_iter}"
    parts.append(f"""
csv AS (SELECT cand_id, j,
               list_slice(v, j * {sub} + 1, (j + 1) * {sub}) AS sv
        FROM kb, range(0, {m}) tj2(j)),
enc AS (SELECT cand_id, j, code FROM (
    SELECT s.cand_id, s.j, p.code,
           ROW_NUMBER() OVER (PARTITION BY s.cand_id, s.j
                              ORDER BY {sd}, p.code) AS rn
    FROM csv s JOIN {fin} p USING (j)) WHERE rn = 1),
recon AS (SELECT e.cand_id, flatten(list(f.cent ORDER BY e.j)) AS rv
          FROM enc e JOIN {fin} f ON f.j = e.j AND f.code = e.code
          GROUP BY e.cand_id),
short AS (SELECT query_id, cand_id FROM (
    SELECT q.query_id, r.cand_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos('q.qv', 'r.rv', dim)} DESC,
                                       r.cand_id) AS sr
    FROM qy q, recon r) WHERE sr <= {shortlist}),
rer AS (SELECT s.query_id, s.cand_id,
               {_cos('q.qv', 'c.v', dim)} AS cos_sim
        FROM short s JOIN qy q USING (query_id)
                     JOIN kb c USING (cand_id))""")
    body = ",".join(parts)
    return f"""WITH {body}
SELECT query_id, cand_id, round(cos_sim, 12) AS cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id) AS rank
  FROM rer) t
WHERE rank <= {k}"""


def ivf_ingest_oracle(k: int = 5, n_centroids: int = 8, n_probe: int = 2,
                      n_iter: int = 3, n_chunks: int = 3,
                      dim: int = DIM) -> str:
    """Oracle for streaming/ann_stream.ivf_ingest_stream over the
    embeddings table delivered in ``n_chunks`` id-ordered micro-batches
    (candidates vec_id >= 10 streamed, queries vec_id < 10 probed after
    the drain): the codebook is the deterministic Lloyd's over the FIRST
    batch's slice only (train-once / add-after-train — vec_ids are dense,
    so batch 0 is exactly ``id < COUNT(*) // n_chunks``); every candidate
    is assigned to its single nearest frozen cell; queries probe n_probe
    cells; in-cell cosine top-k with (cos DESC, cand_id) tie-break."""
    fin = f"c{n_iter}"
    return f"""WITH
kb AS (SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
       FROM embeddings WHERE vec_id >= 10),
kb0 AS (SELECT id, v FROM kb
        WHERE id < (SELECT COUNT(*) // {n_chunks} FROM embeddings)),
qy AS (SELECT vec_id AS query_id,
              list_transform(embedding, x -> x::DOUBLE) AS qv
       FROM embeddings WHERE vec_id < 10),
{_kmeans_ctes('kb0', n_centroids, n_iter, dim)},
asg AS (SELECT id AS cand_id, v, cell FROM (
    SELECT b.id, b.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.id
                              ORDER BY {_dist('b.v', 'c.cent', dim)},
                                       c.cell) AS rn
    FROM kb b, {fin} c) WHERE rn = 1),
prb AS (SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_dist('q.qv', 'c.cent', dim)},
                                       c.cell) AS rn
    FROM qy q, {fin} c) WHERE rn <= {n_probe}),
scored AS (SELECT p.query_id, a.cand_id,
                  {_cos('p.qv', 'a.v', dim)} AS cos_sim
           FROM prb p JOIN asg a USING (cell))
SELECT query_id, cand_id, round(cos_sim, 12) AS cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id) AS rank
  FROM scored) t
WHERE rank <= {k}"""
