"""DuckDB oracle SQL fragments mirroring functions/hashing.py.

Each fragment is the exact SQL twin of a Catalyst expression in
``docling_api_spark.functions.hashing`` — same hash family
(md5-prefix-32), same iteration order, same rounding — so hash-based
operators compare bit-identically across engines.
"""

from __future__ import annotations


def md5long(x: str) -> str:
    return f"CAST('0x'||substr(md5({x}),1,8) AS BIGINT)"


def toks(x: str) -> str:
    return f"list_filter(string_split_regex({x},'\\s+'), t -> t <> '')"


def shingles3(t: str) -> str:
    """Distinct 3-word shingles of token list ``t`` (1-indexed)."""
    return shingles(t, 3)


def shingles(t: str, n: int) -> str:
    """Distinct n-word shingles of token list ``t`` (1-indexed;
    = functions.hashing.word_shingles). range(1, len-(n-2)) is empty
    for len < n (DuckDB range is ascending-only by default). The stop
    bound renders as ``+`` for n < 2 — interpolating a negative value
    after ``-`` would emit ``--``, which SQL parses as a comment."""
    parts = "||' '||".join(f"{t}[i+{j}]" if j else f"{t}[i]" for j in range(n))
    stop = f"len({t})+{2 - n}" if n < 2 else f"len({t})-{n - 2}"
    return f"list_distinct([{parts} for i in range(1, {stop})])"


def minhash(sh: str, num_hashes: int) -> str:
    """MinHash signature list over shingle set ``sh`` — the affine
    universal-hash construction with the exact constants the Spark
    side derives (functions.hashing.minhash_consts), inlined."""
    from docling_api_spark.functions.hashing import MINHASH_P, minhash_consts

    safe = f"(CASE WHEN len({sh})>0 THEN {sh} ELSE [''] END)"
    base = f"[{md5long('x')} for x in {safe}]"
    members = ", ".join(
        f"list_min(list_transform(hs, h -> ({a}*(h%{MINHASH_P})+{b})%{MINHASH_P}))"
        for a, b in (minhash_consts(i) for i in range(num_hashes))
    )
    return f"(SELECT [{members}] FROM (SELECT {base} AS hs))"


def band_key(sig: str, band: int, rows_per_band: int) -> str:
    """LSH band key: md5long of the comma-joined band slice."""
    lo = band * rows_per_band + 1
    hi = (band + 1) * rows_per_band
    piece = f"list_transform({sig}[{lo}:{hi}], v -> CAST(v AS VARCHAR))"
    return md5long(f"list_aggregate({piece}, 'string_agg', ',')")


def md5long60(x: str) -> str:
    return f"CAST('0x'||substr(md5({x}),1,15) AS BIGINT)"


def simhash32(t: str) -> str:
    # Outer CAST: DuckDB's list_sum yields HUGEINT, which the driver
    # fetches as float64 and hash-distinguishes from Spark's BIGINT.
    return (
        f"CAST(list_sum([CASE WHEN list_sum([CASE WHEN ({md5long('tk')} >> b) & 1 = 1 "
        f"THEN 1 ELSE -1 END for tk in {t}]) > 0 THEN 1<<b ELSE 0 END "
        f"for b in range(0,32)]) AS BIGINT)"
    )


def simhash60(t: str) -> str:
    return (
        f"CAST(list_sum([CASE WHEN list_sum([CASE WHEN ({md5long60('tk')} >> b) & 1 = 1 "
        f"THEN 1 ELSE -1 END for tk in {t}]) > 0 THEN (1::BIGINT)<<b ELSE 0 END "
        f"for b in range(0,60)]) AS BIGINT)"
    )


def fingerprint(t: str, mod: int = 1_000_000_007) -> str:
    hashes = f"[{md5long('tk')} for tk in {t}]"
    return f"list_reduce(list_prepend(0, {hashes}), (acc,h) -> (acc*31+h) % {mod})"


def cosine(a: str, b: str, dim: int, scale: int = 6) -> str:
    """Cosine accumulated in DOUBLE in index order (= Spark twin).

    NULL unless both norms are positive and finite — mirrors the
    guard in functions/hashing.py:cosine (Spark's ANSI mode would
    abort on 0.0/0.0, and a NaN norm sorts GREATER than everything on
    both engines, topping every top-k; ``< inf`` rejects NaN and +inf
    in one predicate because NaN compares greater in DuckDB too).
    Both engines agree cosine of a zero/corrupt vector is undefined
    and fails every threshold filter."""
    dot = f"list_sum([CAST({a}[i] AS DOUBLE)*CAST({b}[i] AS DOUBLE) for i in range(1,{dim + 1})])"
    na = f"list_sum([CAST({a}[i] AS DOUBLE)*CAST({a}[i] AS DOUBLE) for i in range(1,{dim + 1})])"
    nb = f"list_sum([CAST({b}[i] AS DOUBLE)*CAST({b}[i] AS DOUBLE) for i in range(1,{dim + 1})])"
    inf = "CAST('inf' AS DOUBLE)"
    return (
        f"CASE WHEN ({na}) > 0 AND ({na}) < {inf} AND ({nb}) > 0 AND ({nb}) < {inf} "
        f"THEN ROUND(({dot})/(sqrt({na})*sqrt({nb})), {scale}) END"
    )


def md5_grid_cte(name: str, prefix: str, rows: int, dim: int, idcol: str, veccol: str) -> str:
    """CTE body ``name(idcol, veccol)`` — the md5_grid constant family
    (= functions.hashing.md5_grid), shared by SRP planes and IVF
    centroids so both engines derive identical grids from the prefix."""
    comp = md5long(f"'{prefix}-'||{idcol}||'-'||j")
    return (
        f"{name} AS (SELECT {idcol}, [(({comp}) % 2001 - 1000)/1000.0 "
        f"for j in range(0,{dim})] AS {veccol} FROM range(0,{rows}) t({idcol}))"
    )


def srp_planes_cte(dim: int, n_bits: int) -> str:
    """CTE body ``planes(p, pl)`` (= functions.hashing.srp_planes)."""
    return md5_grid_cte("planes", "srp", n_bits, dim, "p", "pl")


def srp_sigs_cte(src: str, id_col: str, vec_col: str, dim: int) -> str:
    """CTE body ``sigs(id, bucket)``: SRP signature of every vector in
    ``src`` — cross join with ``planes``, dot in index order, bucket =
    Σ 2^p over positive-dot planes."""
    dot = (
        f"list_sum([CAST(v.{vec_col}[i] AS DOUBLE)*(planes.pl[i]) "
        f"for i in range(1,{dim + 1})])"
    )
    return (
        f"sigs AS (SELECT v.{id_col} AS id, "
        f"SUM(CASE WHEN ({dot}) > 0 THEN 1<<p ELSE 0 END)::BIGINT AS bucket "
        f"FROM {src} v CROSS JOIN planes GROUP BY v.{id_col})"
    )


# Planted-duplicate corpus (pure SQL twin of plans/dedup_q.dup_corpus):
# exact copies of every 10th doc at id+1000000, near-copies (3-token
# suffix) of docs ≡5 (mod 10) at id+2000000.
DUP_CORPUS_CTE = """
dup_corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, text || ' near dup tail' AS text
    FROM documents WHERE doc_id % 10 = 5
)
"""

# Planted-duplicate vector corpus (twin of plans/similarity_q.dup_vectors)
DUP_VECTORS_CTE = """
dup_vectors AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0
)
"""


def ivf_centroids_cte(dim: int, n_cells: int) -> str:
    """CTE body ``cents(c, cv)`` (= functions.hashing.ivf_centroids)."""
    return md5_grid_cte("cents", "ivf", n_cells, dim, "c", "cv")
