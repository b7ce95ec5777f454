"""DuckDB replay builders for the iterative-training oracles
(tokenizers, greedy k-center, Markov attribution, and — round 8 —
Lloyd k-means for the kmeans/semdedup queries).

Round-4 verdict item 1: the BPE and unigram-LM registry queries used to
pin an expected-output frame computed at sf0.01 (``sf_pinned=True``), so
the sf1 answer gate could only rows-check them.  Both trainings are
deterministic folds by construction — exact integer counts with a
total-order tiebreak (BPE), and integer micro-unit-quantized E-step
posteriors (unigram EM) — so the whole computation replays as unrolled
DuckDB SQL, the same way ``pagerank``/``lpa`` oracles replay their
iterations as chained CTEs.  These builders emit that SQL; the oracle is
now scale-portable and the sf1 gate value-hashes it.

Parity notes (each mirrors a specific Spark-side construct):

- word tokenization = ``functions.text.word_tokens``'s documented twin
  (``string_split_regex(lower(text), '[^a-z0-9]+')`` + empty filter);
- the BPE merge application is the same left-to-right non-overlapping
  fold as ``operators/bpe.py::_merge_expr``, expressed with DuckDB's
  no-init ``list_reduce`` by wrapping each symbol as a single-element
  list (the accumulator shape) — acc starts as ``[s1]``, exactly the
  Spark fold after its first step;
- the per-round argmax is ``ORDER BY cnt DESC, a, b LIMIT 1`` — the
  same (count DESC, pair ASC) total order as the Spark ``min_by``
  struct;
- Viterbi / forward / backward are the same position folds as
  ``operators/unigram_lm.py``'s ``aggregate`` HOFs; candidate scan
  order is the identical (s, l) sort, and the inner reductions use
  ``list_reduce`` (left fold, first element as seed) so float summation
  order matches Spark's ``(0.0 + t1) + t2 ...`` bit for bit;
- E-step posteriors quantize to integer micro-units before the M-step
  sum, so the refreshed piece table is exact integer arithmetic in both
  engines (the quantization IS part of the algorithm definition — see
  ``unigram_lm.py::_POSTERIOR_EXPR``).

DuckDB 1.0 gotchas baked in: ``list_reduce`` has no init argument (map
elements to accumulator-shaped values first); multiply-referenced heavy
CTEs re-execute per reference unless ``MATERIALIZED``.
"""

from __future__ import annotations

# Tokenizer twin of functions/text.py::word_tokens
_WF = """
wf AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x <> '')) AS word
    FROM documents)
  GROUP BY word
)"""

# (lang, word) corpus counts — the one corpus-sized aggregate of the
# fertility reports
_LW = """
lw AS (
  SELECT lang, word, COUNT(*) AS n FROM (
    SELECT lang,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x <> '')) AS word
    FROM documents)
  GROUP BY lang, word
)"""


def _bpe_rounds(n_merges: int) -> str:
    """CTE chain learning ``n_merges`` BPE merges: w0 (char symbols +
    </w>) then per round a pair-count aggregate, the deterministic
    argmax m{r}, and the merge fold w{r}."""
    parts = [
        _WF,
        """
w0 AS MATERIALIZED (
  SELECT freq,
         list_append(list_transform(generate_series(1, length(word)),
                                    i -> word[i]), '</w>') AS syms
  FROM wf
)""",
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""
p{r} AS (
  SELECT pr.a AS a, pr.b AS b, SUM(freq) AS cnt
  FROM (SELECT freq,
               unnest(list_transform(generate_series(1, len(syms) - 1),
                      i -> {{'a': syms[i], 'b': syms[i + 1]}})) AS pr
        FROM w{r - 1})
  GROUP BY 1, 2
),
m{r} AS MATERIALIZED (
  SELECT a, b, a || b AS m, cnt FROM p{r}
  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT freq,
         list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE
             WHEN acc[-1] = m{r}.a AND x[1] = m{r}.b
             THEN list_append(acc[:len(acc) - 1], m{r}.m)
             ELSE list_append(acc, x[1]) END) AS syms
  FROM w{r - 1}, m{r}
)""")
    return ",".join(parts)


def bpe_learn_sql(n_merges: int = 12) -> str:
    """Full replay of ``operators/bpe.py::bpe_learn``: the merge table
    in rank order with weighted pair counts."""
    union = "\nUNION ALL\n".join(
        f'SELECT CAST({r} AS INTEGER) AS rank, a AS "left",'
        f' b AS "right", m AS merged,'
        f" CAST(cnt AS BIGINT) AS weighted_count FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + _bpe_rounds(n_merges)
        + "\nSELECT * FROM (\n"
        + union
        + "\n) ORDER BY rank"
    )


def bpe_fertility_sql(n_merges: int = 12) -> str:
    """Replay of ``bpe_fertility_by_lang``: learn the merges, re-segment
    the distinct corpus vocabulary by replaying them in rank order
    (``bpe_segment_vocab``'s fold), and roll up per language."""
    seg_parts = [
        """
seg0 AS MATERIALIZED (
  SELECT word,
         list_append(list_transform(generate_series(1, length(word)),
                                    i -> word[i]), '</w>') AS syms
  FROM (SELECT DISTINCT word FROM lw)
)"""
    ]
    for r in range(1, n_merges + 1):
        seg_parts.append(f"""
seg{r} AS MATERIALIZED (
  SELECT word,
         list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE
             WHEN acc[-1] = m{r}.a AND x[1] = m{r}.b
             THEN list_append(acc[:len(acc) - 1], m{r}.m)
             ELSE list_append(acc, x[1]) END) AS syms
  FROM seg{r - 1}, m{r}
)""")
    return (
        "WITH "
        + _bpe_rounds(n_merges)
        + ","
        + _LW
        + ","
        + ",".join(seg_parts)
        + f"""
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * len(syms)) AS BIGINT) AS n_subwords,
       ROUND(1e-9 + SUM(n * len(syms)) * 1.0 / SUM(n), 4) AS fertility
FROM lw JOIN seg{n_merges} USING (word)
GROUP BY lang"""
    )


# Substring-occurrence lattice + frequency-seeded piece table — twin of
# unigram_lm.py::occ_frame / unigram_piece_table (max_len=4,
# min_rel_freq=1e-5, unconditional single chars).
_UNIGRAM_BASE = (
    _WF
    + """,
occ AS MATERIALIZED (
  SELECT word, freq, o.s AS s, o.l AS l, o.p AS p
  FROM (SELECT word, freq,
          unnest(flatten(list_transform(generate_series(0, length(word) - 1), s ->
            list_transform(generate_series(1, least(4, length(word) - s)), l ->
              {'s': s, 'l': l, 'p': substring(word, s + 1, l)})))) AS o
        FROM wf)
),
pf AS (SELECT p, SUM(freq) AS pfreq FROM occ GROUP BY p),
tot AS (SELECT SUM(pfreq) AS t FROM pf),
kept AS (SELECT p, pfreq FROM pf, tot WHERE pfreq >= t * 1e-5 OR length(p) = 1),
znorm AS (SELECT SUM(pfreq) AS z FROM kept),
pieces0 AS MATERIALIZED (
  SELECT p, pfreq AS freq, ln(pfreq) - ln(z) AS lp FROM kept, znorm
)"""
)


def _em_round(k: int) -> str:
    """One EM iteration, pieces{k} -> pieces{k+1}: forward/backward
    folds per word, micro-unit-quantized posteriors, integer M-step.
    Twin of ``unigram_lm.py::unigram_em_step``; the inner sums use
    no-init ``list_reduce`` so float addition order matches Spark's
    sequential ``aggregate`` fold exactly.  Current position inside the
    outer fold = len(acc) (forward) / length(word) - len(acc)
    (backward) — the wrapped element payload is never read."""
    return f"""
cand{k} AS MATERIALIZED (
  SELECT occ.word, any_value(occ.freq) AS freq,
         list({{'s': occ.s, 'l': occ.l, 'p': occ.p, 'pr': exp(pk.lp)}}
              ORDER BY occ.s, occ.l) AS cs
  FROM occ JOIN pieces{k} pk USING (p)
  GROUP BY occ.word
),
ab{k} AS MATERIALIZED (
  SELECT word, freq, cs,
    list_reduce(
      list_prepend([CAST(1.0 AS DOUBLE)],
        list_transform(generate_series(1, length(word)),
                       i -> [CAST(1.0 AS DOUBLE)])),
      (acc, x) -> list_append(acc,
        list_reduce(
          list_transform(list_filter(cs, c -> c.s + c.l = len(acc)),
                         c -> acc[c.s + 1] * c.pr),
          (a, b) -> a + b))) AS al,
    list_reduce(
      list_prepend([CAST(1.0 AS DOUBLE)],
        list_transform(generate_series(1, length(word)),
                       i -> [CAST(1.0 AS DOUBLE)])),
      (acc, x) -> list_append(acc,
        list_reduce(
          list_transform(list_filter(cs, c -> c.s = length(word) - len(acc)),
                         c -> c.pr * acc[length(word) - (c.s + c.l) + 1]),
          (a, b) -> a + b))) AS be
  FROM cand{k}
),
post{k} AS (
  SELECT p,
         CASE WHEN length(p) = 1 THEN greatest(s, 1) ELSE s END AS freq
  FROM (
    SELECT e.p AS p, SUM(e.cnt) AS s
    FROM (SELECT unnest(list_transform(cs, c -> {{'p': c.p,
            'cnt': CAST(round(freq * 1e6 * al[c.s + 1] * c.pr *
                   be[length(word) - (c.s + c.l) + 1] /
                   al[length(word) + 1]) AS BIGINT)}})) AS e
          FROM ab{k})
    GROUP BY e.p)
  WHERE CASE WHEN length(p) = 1 THEN greatest(s, 1) ELSE s END > 0
),
zp{k} AS (SELECT SUM(freq) AS z FROM post{k}),
pieces{k + 1} AS MATERIALIZED (
  SELECT p, freq, ln(freq) - ln(z) AS lp FROM post{k}, zp{k}
)"""


def _viterbi_report(pieces_cte: str) -> str:
    """Viterbi segmentation of the vocabulary against ``pieces_cte``
    plus the per-language rollup — twin of
    ``unigram_lm.py::_VITERBI_EXPR`` (strict ``>`` update over the
    (s, l)-sorted candidate scan = first-candidate tie policy, which a
    no-init reduce reproduces exactly)."""
    return f"""
cand AS MATERIALIZED (
  SELECT occ.word, list({{'s': occ.s, 'l': occ.l, 'lp': pk.lp}}
                        ORDER BY occ.s, occ.l) AS cs
  FROM occ JOIN {pieces_cte} pk USING (p)
  GROUP BY occ.word
),
vit AS MATERIALIZED (
  SELECT word,
    list_reduce(
      list_prepend([{{'sc': CAST(0.0 AS DOUBLE), 'np': 0}}],
        list_transform(generate_series(1, length(word)),
                       i -> [{{'sc': CAST(0.0 AS DOUBLE), 'np': i}}])),
      (acc, x) -> list_append(acc,
        list_reduce(
          list_transform(list_filter(cs, c -> c.s + c.l = x[1].np),
            c -> {{'sc': acc[c.s + 1].sc + c.lp,
                   'np': acc[c.s + 1].np + 1}}),
          (m, y) -> CASE WHEN y.sc > m.sc THEN y ELSE m END))
    ) AS bests
  FROM cand
),
seg AS MATERIALIZED (
  SELECT word, bests[length(word) + 1].sc AS logprob,
         bests[length(word) + 1].np AS n_pieces
  FROM vit
)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * n_pieces) AS BIGINT) AS n_pieces,
       ROUND(1e-9 + SUM(n * n_pieces) * 1.0 / SUM(n), 4) AS fertility,
       ROUND(1e-9 + (-SUM(n * logprob)) / SUM(n * n_pieces), 4)
         AS nll_per_piece
FROM lw JOIN seg USING (word)
GROUP BY lang"""


def unigram_fertility_sql() -> str:
    """Replay of ``unigram_lm_fertility`` (frequency-seeded pieces, no
    EM)."""
    return "WITH " + _UNIGRAM_BASE + "," + _LW + "," + _viterbi_report(
        "pieces0"
    )


def unigram_em_sql(rounds: int = 2) -> str:
    """Replay of ``unigram_em_refined`` (``rounds`` EM iterations, then
    the Viterbi report under the refined pieces)."""
    ems = ",".join(_em_round(k) for k in range(rounds))
    return (
        "WITH "
        + _UNIGRAM_BASE
        + ","
        + ems
        + ","
        + _LW
        + ","
        + _viterbi_report(f"pieces{rounds}")
    )


def kcenter_sql(k: int = 16) -> str:
    """Replay of ``operators/linalg.py::kcenter_select`` — the greedy
    farthest-first traversal (Gonzalez 1985), unrolled to ``k`` CTE
    rounds: pick = (d2 DESC, id ASC) argmax, distance fold = the same
    init-0 sequential squared-L2 sum as the Spark ``aggregate`` HOF, so
    d2 is bitwise identical cross-engine and the id tiebreak can never
    diverge.  radius_after at rank r = max residual d2 once picks 1..r
    are folded in (the Gonzalez coverage radius)."""

    def sqd(vcol: str, ccol: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, len({vcol})), "
            f"i -> ({vcol}[i] - {ccol}[i]) * ({vcol}[i] - {ccol}[i]))), "
            "(a, b) -> a + b)"
        )

    parts = [
        """
src AS MATERIALIZED (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
c1 AS MATERIALIZED (SELECT id, v FROM src ORDER BY id LIMIT 1),
d1 AS MATERIALIZED (
  SELECT s.id, s.v, """
        + sqd("s.v", "c1.v")
        + """ AS d2
  FROM src s, c1
)"""
    ]
    for r in range(2, k + 1):
        parts.append(f"""
c{r} AS MATERIALIZED (
  SELECT id, v FROM d{r - 1} ORDER BY d2 DESC, id ASC LIMIT 1),
d{r} AS MATERIALIZED (
  SELECT d.id, d.v, least(d.d2, {sqd('d.v', f'c{r}.v')}) AS d2
  FROM d{r - 1} d, c{r}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS rank,"
        f" (SELECT id FROM c{r}) AS vec_id,"
        f" (SELECT ROUND(1e-9 + MAX(d2), 4) FROM d{r}) AS radius_after"
        for r in range(1, k + 1)
    )
    return (
        "WITH "
        + ",".join(parts)
        + "\nSELECT rank, CAST(vec_id AS BIGINT) AS vec_id,"
        " CAST(radius_after AS DOUBLE) AS radius_after FROM (\n"
        + union
        + "\n) ORDER BY rank"
    )


def kmeans_assign_ctes(k_expr: str, iters: int) -> str:
    """CTE chain replaying ``operators/linalg.py::kmeans_lloyd`` under
    its round-8 value-determinism rule, ending in ``a{iters}`` (the
    final (id, cl) assignment) and ``src`` (id, v as DOUBLE[]).

    Mirrored constructs, piece by piece:

    - ``src`` = the Spark source projection (vec_id cast long, embedding
      cast to double, nulls dropped) — float32→float64 is exact, so both
      engines start from identical vectors;
    - seeds = the vectors at ranks 1, 1+step, …, 1+(k-1)·step of the id
      ordering with step = max(n // k, 1)
      (``stride_seed_ids_frame``); cluster index = rank order;
    - assignment ranks ``ROUND(d2 + 1e-9, 6)`` (d2 via
      ``list_distance²`` here, the BLAS ``|v|²-2vc+|c|²`` identity on
      the Spark side — the ~1e-14 cross-engine gap vanishes under the
      1e-6 quantum) and breaks ties on the LOWEST cluster index, via a
      lexicographic struct ``min({'d': …, 'c': cl})`` = numpy argmin's
      native tie rule;
    - centroid means quantize to ``ROUND(m + 1e-9, 7)`` so the two
      engines' summation orders can't drift apart across iterations;
      empty clusters keep the previous centroid (the LEFT JOIN
      COALESCE), exactly Spark's ``cent[nonempty] = …`` update.

    ``k_expr`` is evaluated against ``SELECT … FROM src`` and may use
    COUNT(*) — adaptive-k callers (semdedup's ``max(16, n/256)``)
    stay scale-portable with no literal baked in."""
    parts = [
        """
src AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
params AS (
  SELECT n, k, GREATEST(n // k, 1) AS step
  FROM (SELECT COUNT(*) AS n, """
        + k_expr
        + """ AS k FROM src)
),
c0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl, v
  FROM (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rnk FROM src),
       params
  WHERE (rnk - 1) % step = 0 AND rnk <= 1 + (k - 1) * step
)"""
    ]
    d2q = (
        "ROUND(POWER(list_distance(s.v, c.v), 2) + 1e-9, 6)"
    )
    for t in range(iters + 1):
        parts.append(f"""
a{t} AS MATERIALIZED (
  SELECT s.id, (min({{'d': {d2q}, 'c': c.cl}})).c AS cl
  FROM src s CROSS JOIN c{t} c
  GROUP BY s.id
)""")
        if t == iters:
            break
        parts.append(f"""
m{t} AS (
  SELECT cl, list(mv ORDER BY dim) AS v
  FROM (
    SELECT cl, dim, ROUND(AVG(val) + 1e-9, 7) AS mv
    FROM (
      SELECT a.cl AS cl,
             unnest(generate_series(1, len(s.v))) AS dim,
             unnest(s.v) AS val
      FROM a{t} a JOIN src s USING (id))
    GROUP BY cl, dim)
  GROUP BY cl
),
c{t + 1} AS MATERIALIZED (
  SELECT c.cl, COALESCE(m.v, c.v) AS v
  FROM c{t} c LEFT JOIN m{t} m USING (cl)
)""")
    return ",".join(parts)


def kmeans_profile_sql(k: int = 8, iters: int = 3) -> str:
    """Replay of ``kmeans_cluster_profile``: full Lloyd training, then
    the per-cluster size / label-count / purity rollup."""
    return (
        "WITH "
        + kmeans_assign_ctes(str(k), iters)
        + f""",
per AS (
  SELECT a.cl AS cluster, e.label, COUNT(*) AS n
  FROM a{iters} a JOIN embeddings e ON e.vec_id = a.id
  GROUP BY 1, 2
)
SELECT CAST(cluster AS INTEGER) AS cluster,
       CAST(SUM(n) AS BIGINT) AS size,
       CAST(COUNT(*) AS BIGINT) AS n_labels,
       ROUND(1e-9 + MAX(n) * 1.0 / SUM(n), 4) AS top_label_share
FROM per GROUP BY cluster"""
    )


def semdedup_sql(iters: int = 3) -> str:
    """Replay of ``semdedup_embedding``: adaptive-k Lloyd
    (k = max(16, n // 256), computed in-SQL over the null-filtered
    ``src`` so the oracle scales with the corpus — the Spark side
    counts the same null-filtered set, round-8 ADVICE), then the
    within-cluster cosine >= 0.95 min-id removal rule and the
    per-cluster rollup.  The cosine is quantized ROUND(cs + 1e-9, 6)
    BEFORE thresholding on both engines (round-8 ADVICE): raw
    cross-engine floats differ ~1e-15, so an unquantized >= 0.95 could
    flip a threshold-straddling pair; under the 1e-6 quantum the noise
    sits 9 orders of magnitude below the comparison."""
    return (
        "WITH "
        + kmeans_assign_ctes("GREATEST(16, COUNT(*) // 256)", iters)
        + f""",
base AS MATERIALIZED (
  SELECT s.id, s.v, a.cl AS cluster
  FROM a{iters} a JOIN src s USING (id)
),
pairs AS (
  SELECT cluster, removed_id, cs FROM (
    SELECT l.cluster, r.id AS removed_id,
           ROUND(list_cosine_similarity(l.v, r.v) + 1e-9, 6) AS cs
    FROM base l JOIN base r
      ON l.cluster = r.cluster AND l.id < r.id)
  WHERE cs >= 0.95
),
removed AS (
  SELECT cluster, COUNT(DISTINCT removed_id) AS n_removed,
         ROUND(1e-9 + MAX(cs), 4) AS max_dup_cos
  FROM pairs GROUP BY cluster
),
sizes AS (SELECT cluster, COUNT(*) AS n_vecs FROM base GROUP BY cluster)
SELECT CAST(s.cluster AS INTEGER) AS cluster,
       CAST(s.n_vecs AS BIGINT) AS n_vecs,
       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(r.max_dup_cos AS DOUBLE) AS max_dup_cos
FROM sizes s LEFT JOIN removed r USING (cluster)
ORDER BY cluster"""
    )


def _markov_matmul(a: str, b: str) -> str:
    return (
        f"SELECT a.variant, a.si, b.sj, SUM(a.v * b.v) AS v "
        f"FROM {a} a JOIN {b} b ON a.variant = b.variant AND a.sj = b.si "
        f"GROUP BY 1, 2, 3"
    )


def markov_removal_sql(m: int = 10) -> str:
    """Replay of ``operators/attribution.py`` — transition counting
    (same trim-at-first-conversion LAG/LEAD windows) plus the absorbing
    -chain solve for the base chain AND every removal variant at once.

    The solve replaces numpy's exact (I-Q)^{-1}R with the Neumann sum
    x = sum_k Q^k R accumulated by ``m`` matrix squarings
    (S_{j+1} = S_j + P_j S_j, P_{j+1} = P_j^2 — 2^m = 1024 chain steps
    at m=10), the same unroll-the-iteration trick as the pagerank/LPA
    oracles.  The chains absorb geometrically, so the truncation error
    at 1024 steps is far below double resolution — the r4-rounded
    removal effects are identical to the exact solve.  All variants
    share the (variant, si, sj) triple representation; each matrix is
    at most (|event_types|+1)^2 entries, so the whole solve is a few
    hundred rows regardless of sf.  Event ts is CAST to microsecond
    TIMESTAMP so ordering matches Spark's nanos-floored reader."""
    parts = [
        """
steps AS MATERIALIZED (
  SELECT u, s,
         LAG(s)  OVER (PARTITION BY u ORDER BY ts, event_id) AS prev,
         LEAD(s) OVER (PARTITION BY u ORDER BY ts, event_id) AS nxt
  FROM (
    SELECT user_id AS u, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CASE WHEN event_type = 'purchase' THEN '__conv__'
                ELSE event_type END AS s,
           COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS prior_convs
    FROM events)
  WHERE prior_convs = 0
),
trans AS MATERIALIZED (
  SELECT src, dst, COUNT(*) AS n FROM (
    SELECT '__start__' AS src, s AS dst FROM steps WHERE prev IS NULL
    UNION ALL
    SELECT s, nxt FROM steps WHERE nxt IS NOT NULL
    UNION ALL
    SELECT s, '__null__' FROM steps WHERE nxt IS NULL AND s <> '__conv__')
  GROUP BY src, dst
),
chans AS MATERIALIZED (
  SELECT DISTINCT st AS c FROM (
    SELECT src AS st FROM trans UNION SELECT dst FROM trans)
  WHERE st NOT IN ('__start__', '__conv__', '__null__')
),
variants AS (SELECT '__base__' AS variant UNION ALL SELECT c FROM chans),
red AS MATERIALIZED (
  SELECT v.variant, t.src,
         CASE WHEN t.dst = v.variant THEN '__null__' ELSE t.dst END AS dst,
         SUM(t.n) AS n
  FROM variants v JOIN trans t ON t.src <> v.variant
  GROUP BY 1, 2, 3
),
rowtot AS (SELECT variant, src, SUM(n) AS tot FROM red GROUP BY 1, 2),
tstates AS MATERIALIZED (SELECT DISTINCT variant, src AS st FROM red),
q0 AS MATERIALIZED (
  SELECT r.variant, r.src AS si, r.dst AS sj, SUM(r.n * 1.0 / rt.tot) AS v
  FROM red r
  JOIN rowtot rt ON rt.variant = r.variant AND rt.src = r.src
  JOIN tstates ts ON ts.variant = r.variant AND ts.st = r.dst
  GROUP BY 1, 2, 3
),
rconv AS MATERIALIZED (
  SELECT r.variant, r.src AS si, SUM(r.n * 1.0 / rt.tot) AS v
  FROM red r JOIN rowtot rt ON rt.variant = r.variant AND rt.src = r.src
  WHERE r.dst = '__conv__'
  GROUP BY 1, 2
),
s0 AS (SELECT variant, st AS si, st AS sj, CAST(1.0 AS DOUBLE) AS v
       FROM tstates),
p0 AS (SELECT * FROM q0)"""
    ]
    for j in range(m):
        parts.append(f"""
s{j + 1} AS MATERIALIZED (
  SELECT variant, si, sj, SUM(v) AS v FROM (
    SELECT variant, si, sj, v FROM s{j}
    UNION ALL
    {_markov_matmul(f'p{j}', f's{j}')})
  GROUP BY 1, 2, 3
),
p{j + 1} AS MATERIALIZED (
  {_markov_matmul(f'p{j}', f'p{j}')}
)""")
    parts.append(f"""
xs AS MATERIALIZED (
  SELECT s.variant, s.si, SUM(s.v * r.v) AS x
  FROM s{m} s JOIN rconv r ON r.variant = s.variant AND r.si = s.sj
  WHERE s.si = '__start__'
  GROUP BY 1, 2
),
-- COALESCE(MAX(..)) so xbase is ALWAYS one row: with zero conversions
-- xs is empty, and a bare CROSS JOIN against an empty xbase would drop
-- every channel row (Spark emits one 0.0 row per channel) — the <=0
-- branch below must be reachable (round-5 ADVICE fix)
xbase AS (SELECT COALESCE(MAX(x), 0) AS xb FROM xs
          WHERE variant = '__base__'),
eff AS (
  SELECT c.c AS channel,
         CASE WHEN xbase.xb IS NULL OR xbase.xb <= 0 THEN 0.0
              ELSE GREATEST(0.0, 1.0 - COALESCE(xv.x, 0) / xbase.xb)
              END AS e
  FROM chans c
  LEFT JOIN (SELECT variant, x FROM xs) xv ON xv.variant = c.c
  CROSS JOIN xbase
),
efftot AS (SELECT SUM(e) AS t FROM eff)""")
    return (
        "WITH "
        + ",".join(parts)
        + """
SELECT channel,
       ROUND(1e-9 + e, 4) AS removal_effect,
       ROUND(1e-9 + CASE WHEN efftot.t > 0 THEN e / efftot.t ELSE 0.0 END, 4)
         AS attribution
FROM eff CROSS JOIN efftot"""
    )
