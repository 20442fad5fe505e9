"""Corpus-indexing queries: inverted index, skip-gram co-occurrence,
and per-dimension embedding statistics — the IR/representation-
learning prep stages of a corpus pipeline.

SAS analogs are loose (SAS has no IR surface): PROC FREQ over
SCAN-loop outputs for the index and co-occurrence tables, PROC MEANS
over a transposed array for the dimension stats. The Spark forms are
the idiomatic ones: explode/posexplode + aggregation, with plan
shapes that hold at corpus scale (notes per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query

# -- inverted index ---------------------------------------------------

MIN_DF = 10
POSTING_CAP = 5


@query(
    "q_inverted_index",
    oracle=f"""
    with pairs as (
        select distinct word, doc_id
        from (select doc_id, unnest(string_split(text, ' ')) as word
              from documents) t
    ),
    agg as (
        select word, count(*) as df,
               list(doc_id order by doc_id) as all_postings
        from pairs group by word
    )
    select word, cast(df as bigint) as df,
           array_to_string(list_slice(all_postings, 1, {POSTING_CAP}), ',')
               as postings
    from agg where df >= {MIN_DF}
    """,
    tags=("text", "llm"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, document frequency + the first
    5 (POSTING_CAP) doc ids of its posting list (IR: the index behind
    keyword retrieval; SAS: SCAN-loop OUTPUT + PROC SORT NODUPKEY +
    PROC FREQ).

    Scale: (word, doc_id) pairs dedup map-side via the distinct's
    partial aggregate; posting lists build as sorted arrays per term.
    Real web-scale postings exceed single-task memory — there the cap
    becomes a windowed top-k BEFORE collect (same plan shape, bounded
    state); the df count is exact either way.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    # postings emit as a comma-joined string: the capped head of the
    # sorted posting list, value-identical across engines and friendly
    # to the driver's column-wise row sort (array cells don't order).
    agg = pairs.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, POSTING_CAP
                ),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return agg.filter(F.col("df") >= MIN_DF).select(
        "word", "df", "postings"
    )


# -- skip-gram co-occurrence -----------------------------------------

SKIP_WINDOW = 2
TOP_PAIRS = 20


@query(
    "q_skipgrams",
    oracle=f"""
    with pos as (
        select doc_id,
               unnest(generate_series(1, len(string_split(text, ' '))))
                   as pos,
               unnest(string_split(text, ' ')) as word
        from documents
    )
    select p1.word as w1, p2.word as w2, cast(count(*) as bigint) as c
    from pos p1
    join pos p2 on p2.doc_id = p1.doc_id
               and p2.pos > p1.pos and p2.pos <= p1.pos + {SKIP_WINDOW}
    group by p1.word, p2.word
    order by c desc, w1, w2
    limit {TOP_PAIRS}
    """,
    tags=("text", "llm"),
)
def q_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts within a +/-2 (SKIP_WINDOW) token
    window (word2vec/GloVe training prep; SAS: LAG chains + PROC
    FREQ).

    Positions come from ONE posexplode pass; the pair generation is a
    doc-keyed equi-join with a position-range residual — work bounded
    by tokens x window, never tokens^2. Top-20 ties break on the word
    pair for a deterministic limit.

    Scale: the join key is doc_id, so co-occurrence never crosses
    documents — both sides partition identically and AQE can pick a
    shuffle-hash join; the pair agg combines map-side (vocab^2 is
    far smaller than the pair stream).
    """
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )
    p1 = pos.alias("p1")
    p2 = pos.alias("p2")
    joined = p1.join(
        p2,
        (F.col("p2.doc_id") == F.col("p1.doc_id"))
        & (F.col("p2.pos") > F.col("p1.pos"))
        & (F.col("p2.pos") <= F.col("p1.pos") + SKIP_WINDOW),
    )
    return (
        joined.groupBy(
            F.col("p1.word").alias("w1"), F.col("p2.word").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(TOP_PAIRS)
    )


# -- per-dimension embedding statistics ------------------------------


@query(
    "q_embed_dim_stats",
    oracle="""
    with d as (
        select unnest(generate_series(1, len(embedding))) as dim,
               unnest(embedding) as v
        from embeddings
    )
    select dim, cast(count(*) as bigint) as n,
           round(avg(cast(v as double)), 6) as mean,
           round(stddev_samp(cast(v as double)), 6) as std,
           min(v) as vmin, max(v) as vmax
    from d group by dim
    """,
    tags=("similarity", "llm", "quality"),
)
def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (embedding QA: dead or
    exploding dimensions, normalization drift before indexing; SAS:
    PROC MEANS over a transposed ARRAY).

    posexplode flattens vectors to (dim, value) — 64 groups regardless
    of corpus size, so the agg output is constant and the shuffle
    carries only partial aggregates. min/max stay float32
    (comparison-only, engine-exact); mean/std compute in double and
    round 6dp (summation-order drift ~1e-13 « rounding grain).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode("embedding").alias("dim0", "v")
    ).select((F.col("dim0") + 1).cast("long").alias("dim"), "v")
    return flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("v").cast("double")), 6).alias("mean"),
        F.round(F.stddev_samp(F.col("v").cast("double")), 6).alias("std"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )


# -- PMI collocation scores ------------------------------------------

PMI_MIN_COUNT = 30
PMI_TOP = 20


@query(
    "q_pmi_scores",
    oracle=f"""
    with pos as (
        select doc_id,
               unnest(generate_series(1, len(string_split(text, ' '))))
                   as pos,
               unnest(string_split(text, ' ')) as word
        from documents
    ),
    pairs as (
        select p1.word as w1, p2.word as w2, count(*) as c12
        from pos p1
        join pos p2 on p2.doc_id = p1.doc_id and p2.pos = p1.pos + 1
        group by p1.word, p2.word
    ),
    uni as (
        select word, count(*) as c from pos group by word
    ),
    tot as (
        select (select sum(c12) from pairs) as n_pairs,
               (select sum(c) from uni) as n_words
    )
    select w1, w2, cast(c12 as bigint) as c12,
           round(ln((c12 * 1.0 / tot.n_pairs)
                    / ((u1.c * 1.0 / tot.n_words)
                       * (u2.c * 1.0 / tot.n_words))), 6) as pmi
    from pairs
    join uni u1 on u1.word = pairs.w1
    join uni u2 on u2.word = pairs.w2
    cross join tot
    where c12 >= {PMI_MIN_COUNT}
    order by pmi desc, w1, w2
    limit {PMI_TOP}
    """,
    tags=("text", "llm", "stats"),
)
def q_pmi_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-pair collocations by pointwise mutual information
    (phrase mining / tokenizer-merge candidates: PMI =
    ln(P(w1,w2) / (P(w1)P(w2))) over adjacent word pairs; SAS: LAG +
    PROC FREQ + a DATA-step formula).

    A min-count floor keeps the estimate stable (textbook PMI
    practice); ties at the LIMIT boundary break on the word pair.
    Probabilities use each table's own total (pairs vs words), both
    computed from the same scan.

    Scale: the adjacency join is doc-keyed (same shape as
    q_skipgrams); unigram and pair tables reduce map-side and join
    back bounded by vocabulary; top-20 is TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    p1 = pos.alias("p1")
    p2 = pos.alias("p2")
    pairs = (
        p1.join(
            p2,
            (F.col("p2.doc_id") == F.col("p1.doc_id"))
            & (F.col("p2.pos") == F.col("p1.pos") + 1),
        )
        .groupBy(F.col("p1.word").alias("w1"), F.col("p2.word").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    uni = pos.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = pairs.agg(F.sum("c12").alias("n_pairs")).crossJoin(
        uni.agg(F.sum("c").alias("n_words"))
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    scored = (
        pairs.filter(F.col("c12") >= PMI_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12") * 1.0 / F.col("n_pairs"))
                    / (
                        (F.col("c1") * 1.0 / F.col("n_words"))
                        * (F.col("c2") * 1.0 / F.col("n_words"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(PMI_TOP)


# -- character-entropy quality signal ---------------------------------


@query(
    "q_char_entropy",
    oracle="""
    with ch as (
        select doc_id, len(text) as n,
               unnest(string_split_regex(text, '')) as c
        from documents
    ),
    cnt as (
        select doc_id, c, count(*) as k, min(n) as n
        from ch group by doc_id, c
    )
    select doc_id,
           cast(count(*) as bigint) as n_distinct_chars,
           round(sum(-(k * 1.0 / n) * ln(k * 1.0 / n)), 6) as entropy
    from cnt group by doc_id
    """,
    tags=("text", "llm", "quality"),
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's character distribution — a
    classic corpus-quality signal (too LOW = repetitive/degenerate
    filler, too HIGH = binary junk or encoding damage; used alongside
    the Gopher repetition rules).

    H = -sum over distinct chars of p ln p, p = char count / length.
    Spelled RELATIONALLY (explode chars -> per-(doc, char) count ->
    per-doc sum) rather than as per-row array HOFs: the HOF form
    re-evaluated its O(distinct x len) count lambda per element
    OUTSIDE codegen (the interpreted-HOF CSE trap, SCALE.md round-6
    finding) and measured 4.5 s at sf0.1; the relational form is
    whole-stage-codegen end to end (~0.2 s, at the DuckDB twin).
    Engines sum the <=27 entropy terms in different orders — 6dp
    rounding sits ~9 orders above the drift.

    Scale: explode fans out len(text) rows but they reduce map-side
    to (doc, char) pairs immediately; both aggs combine partially, and
    the doc-keyed shuffle carries at most |alphabet| rows per doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.length("text").alias("n"),
        F.explode(F.split(F.col("text"), "")).alias("c"),
    )
    cnt = chars.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).alias("k"), F.min("n").alias("n")
    )
    p = F.col("k") * 1.0 / F.col("n")
    return cnt.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(F.sum(-p * F.log(p)), 6).alias("entropy"),
    )


# -- BPE merge-candidate counting -------------------------------------


@query(
    "q_bpe_merges",
    oracle="""
    with tok as (
        select unnest(string_split(text, ' ')) as w from documents
    ),
    pairs as (
        select unnest(list_transform(range(1, length(w)),
                                     i -> substr(w, i, 2))) as pair
        from tok
        where length(w) >= 2
    )
    select pair, cast(count(*) as bigint) as c
    from pairs
    group by pair
    order by c desc, pair
    limit 20
    """,
    tags=("llm", "text", "tokenizer"),
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-induction pair counting — the scoring pass of one BPE
    merge iteration (Sennrich et al.: repeatedly merge the most
    frequent adjacent symbol pair). At the character stage every
    word's adjacent char pairs vote weighted by the word's corpus
    frequency; the top pair becomes the next merge rule. Training a
    real vocab runs this loop ~30k times against the merged symbol
    stream — the per-iteration shape is exactly this query, so its
    cost and plan are what a distributed BPE trainer amortizes.

    Plan: explode words at the scan, explode each word's adjacent-pair
    array (sequence + substring inside one codegen Project — pairs
    never materialize per-doc), one map-side-combined count keyed by
    the 2-char pair (vocab-bounded domain: |alphabet|^2 keys), then
    TakeOrderedAndProject for the deterministic top-20. Shuffle rows =
    distinct pairs per partition, NOT corpus tokens. No window, no
    join."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1),"
                       " i -> substring(w, i, 2))")
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(20)
    )


# -- BPE merge-table APPLY (greedy encode) -----------------------------

#: Rendered-symbol markers for the BPE apply fold. Each symbol is
#: rendered as chr(1)||sym||chr(2), so a merge rule's search pattern
#: (two adjacent rendered symbols) shares no characters with its
#: neighbors — plain left-to-right replace() then merges EVERY
#: occurrence in one pass (a bare-separator rendering loses alternate
#: occurrences because the match consumes the shared junction char)
#: and cannot match inside a multi-char symbol (the markers only ever
#: align with symbol boundaries).
_BPE_SOH = "\x01"
_BPE_STX = "\x02"


@query(
    "q_bpe_encode",
    oracle="""
    with tok as (
        select unnest(string_split(text, ' ')) as w from documents
    ),
    pairs as (
        select unnest(list_transform(range(1, length(w)),
                                     i -> substr(w, i, 2))) as pair
        from tok
        where length(w) >= 2
    ),
    merges as (
        select pair, count(*) as c
        from pairs group by pair
        order by c desc, pair limit 20
    ),
    rules as (
        select list(pair order by c desc, pair) as rules from merges
    ),
    enc as (
        select d.doc_id, d.text,
               list_reduce(
                   list_prepend(
                       regexp_replace(d.text, '(.)',
                                      chr(1) || '\\1' || chr(2), 'g'),
                       r.rules),
                   (acc, p) -> replace(
                       acc,
                       chr(1) || p[1] || chr(2) || chr(1) || p[2] || chr(2),
                       chr(1) || p || chr(2))
               ) as s
        from documents d cross join rules r
    ),
    stats as (
        select doc_id, s,
               length(s) - length(replace(s, chr(1), '')) as n_sym,
               length(text) - length(replace(text, ' ', '')) as n_space,
               length(replace(text, ' ', '')) as n_chars
        from enc
    )
    select doc_id,
           cast(n_sym - n_space as bigint) as n_tokens,
           round(n_chars * 1.0 / nullif(n_sym - n_space, 0), 6)
               as chars_per_token,
           substr(sha256(s), 1, 16) as token_digest
    from stats
    """,
    tags=("llm", "text", "tokenizer"),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — greedy-encode every document with the merge
    table q_bpe_merges derives (top-20 first-generation pairs, applied
    in priority order: count desc, pair asc), closing the tokenizer
    count -> apply loop (VERDICT r9 item 6 / What's-missing 4; a
    production vocab iterates this count/apply pair ~30k times).

    Encode = fold: each char of the text is rendered as a
    chr(1)+c+chr(2) symbol (one regexp_replace), then each rule in
    table order runs one plain replace() of the two-symbol search
    pattern with the merged symbol — left-to-right, non-overlapping,
    all occurrences in one pass, which is exactly Sennrich's per-rule
    merge semantics (a pair consumed by an earlier, higher-priority
    rule is no longer there for later rules; a rule never re-merges
    its own output since the merged symbol differs from both halves).
    No rule contains a space (pairs are counted within words), so
    space symbols are natural merge barriers and the whole document
    encodes in ONE fold. The oracle replays the identical fold with
    list_reduce(list_prepend(...)) over the same rule list.

    Attested payload per doc: token count (symbols minus spaces),
    chars-per-token compression, and a sha256 prefix of the rendered
    token stream — any wrong merge anywhere flips the digest.

    Plan shape: the pair-counting subplan is q_bpe_merges (map-side-
    combined count on the |alphabet|^2-bounded pair domain); the
    20-rule table collapses to ONE broadcast row whose array feeds
    the scan-side fold — encoding is embarrassingly partitioned, zero
    shuffle beyond the bounded rule aggregation, and the 20 replace
    passes per doc are O(rules x len) exactly like any BPE applier."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1),"
                       " i -> substring(w, i, 2))")
            ).alias("pair")
        )
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(20)
    )
    rules = top.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("c")).alias("nc"), "pair"))
            ),
            lambda s: s["pair"],
        ).alias("rules")
    )
    soh, stx = F.lit(_BPE_SOH), F.lit(_BPE_STX)
    rendered = F.regexp_replace(
        F.col("text"), "(.)", _BPE_SOH + "$1" + _BPE_STX
    )
    enc = docs.crossJoin(F.broadcast(rules)).select(
        "doc_id",
        "text",
        F.aggregate(
            "rules",
            rendered,
            lambda acc, p: F.replace(
                acc,
                F.concat(
                    soh, F.substring(p, 1, 1), stx,
                    soh, F.substring(p, 2, 1), stx,
                ),
                F.concat(soh, p, stx),
            ),
        ).alias("s"),
    )
    n_sym = F.length("s") - F.length(F.replace(F.col("s"), soh, F.lit("")))
    n_space = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    )
    n_chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_tokens = n_sym - n_space
    return enc.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        # empty / all-space docs have 0 tokens: NULL ratio on BOTH
        # engines (oracle: nullif divisor), never an ANSI div-by-zero
        F.round(
            F.when(n_tokens > 0, n_chars * F.lit(1.0) / n_tokens), 6
        ).alias("chars_per_token"),
        F.sha2(F.col("s"), 256).substr(1, 16).alias("token_digest"),
    )


# -- heavy hitters (bounded-memory sketch + exact recount) --------------

#: Misra-Gries counters per task; heavy = count * (HH_M + 1) > N.
HH_M = 29


@query(
    "q_heavy_hitters",
    oracle=f"""
    with tok as (
        select unnest(string_split(text, ' ')) as term from documents
    ),
    n as (select cast(count(*) as bigint) as n_total from tok)
    select term, cast(count(*) as bigint) as c, n_total
    from tok cross join n
    group by term, n_total
    having count(*) * {HH_M + 1} > n_total
    """,
    tags=("text", "sketch", "scale"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters at BOUNDED MEMORY — terms whose corpus frequency
    exceeds N/{HH_M + 1}, computed via a Misra-Gries candidate sketch
    (at most {HH_M} counters per task regardless of distinct-term
    cardinality; operators/sketch.py) followed by an exact recount of
    only the surviving candidates. The MG guarantee (every globally
    heavy item is heavy in some partition, and per-partition summary
    error is <= N_p/(m+1)) makes candidates a provable SUPERSET of the
    true heavy set, so the exact-recount filter returns EXACTLY the
    true heavy hitters — deterministic under any partitioning or row
    order, which is why a sketch-based plan can hash-match the plain
    GROUP BY / HAVING oracle. The threshold compare is pure integer
    arithmetic (c * {HH_M + 1} > N), no float boundary.

    Scale: this is the operator for the regime where a full group-by's
    per-task hash map itself blows memory (billions of distinct keys
    per task): the sketch pass holds {HH_M} counters, the recount
    scans with a broadcast semi-join on the tiny candidate set, and
    the only full-width shuffle ever keyed is candidates x tasks. SAS
    analog: none (PROC FREQ materializes the full table) — this is
    the modern streaming-sketch family (Misra-Gries / SpaceSaving,
    mergeable-summaries form)."""
    from sas_etl_spark.operators.sketch import heavy_hitters_exact

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("term"))
    return heavy_hitters_exact(tok, "term", HH_M)


# -- BPE TRAINING loop (multi-generation) ------------------------------

#: Generations the registered training query runs. Each generation is
#: one count-pairs -> argmax -> re-encode iteration; the oracle
#: unrolls exactly this many.
BPE_TRAIN_GENS = 6

#: chr(3) separates the two symbols inside a pair key (symbols are
#: multi-char from generation 2 on, so a bare concat would be
#: ambiguous).
_BPE_SEP = "\x03"


def _bpe_symbols(s) -> "F.Column":
    """Symbol array from a rendered corpus string: split on the
    inter-symbol boundary chr(2)chr(1), strip the outer markers."""
    return F.transform(
        F.split(s, _BPE_STX + _BPE_SOH),
        lambda x: F.regexp_replace(x, f"[{_BPE_SOH}{_BPE_STX}]", ""),
    )


@query(
    "q_bpe_train",
    oracle="\n".join(
        ["with e0 as (",
         "    select doc_id,",
         "           regexp_replace(text, '(.)',",
         "                          chr(1) || '\\1' || chr(2), 'g') as s",
         "    from documents",
         ")"]
        + [f""",
    sy{g} as (
        select list_transform(string_split(s, chr(2) || chr(1)),
                   x -> replace(replace(x, chr(1), ''), chr(2), ''))
               as syms
        from e{g - 1}
    ),
    p{g} as (
        select pk, count(*) as c from (
            select unnest(list_transform(
                list_filter(range(1, len(syms)),
                    i -> syms[i] <> ' ' and syms[i + 1] <> ' '),
                i -> syms[i] || chr(3) || syms[i + 1])) as pk
            from sy{g}
        ) t group by pk
    ),
    m{g} as (
        select {g} as gen,
               string_split(pk, chr(3))[1] as left_sym,
               string_split(pk, chr(3))[2] as right_sym,
               c
        from p{g} order by c desc, pk limit 1
    ),
    e{g} as (
        select doc_id,
               replace(s, chr(1) || m.left_sym || chr(2)
                          || chr(1) || m.right_sym || chr(2),
                       chr(1) || m.left_sym || m.right_sym || chr(2)) as s
        from e{g - 1} cross join m{g} m
    )""" for g in range(1, BPE_TRAIN_GENS + 1)]
        + ["\n    select cast(gen as int) as gen, left_sym, right_sym,"
           "\n           left_sym || right_sym as merged,"
           "\n           cast(c as bigint) as n_pairs"
           "\n    from (" ]
        + [("        union all\n" if g > 1 else "")
           + f"        select * from m{g}" for g in range(1, BPE_TRAIN_GENS + 1)]
        + ["    ) t"]
    ),
    tags=("llm", "text", "tokenizer", "iterative"),
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-generation BPE TRAINING — the actual Sennrich loop, not
    one iteration: generation g counts adjacent SYMBOL pairs on the
    corpus as encoded by the first g-1 merges, takes the argmax pair
    (count desc, pair asc — deterministic), appends it to the merge
    table, and re-encodes. q_bpe_merges is the scoring pass,
    q_bpe_encode the apply pass; this closes the loop they describe
    ("training a real vocab runs this loop ~30k times") at
    {BPE_TRAIN_GENS} generations, with the oracle unrolling the
    IDENTICAL iterations in chained CTEs (the q_pagerank pattern for
    iterative dataflow). From generation 2 on the merged symbols are
    multi-character — pair keys carry a chr(3) separator and the
    chr(1)/chr(2) symbol rendering (q_bpe_encode's) keeps every
    replace unambiguous; space symbols never pair, so words stay
    merge barriers without any per-word explode.

    Attested payload: the full training trajectory — (generation,
    left symbol, right symbol, merged token, corpus pair count). A
    wrong count, a wrong tiebreak, or a wrong re-encode at ANY
    generation changes every later generation and flips the hash.

    Scale shape: each generation is (a) one map-side-combined count
    over scan-side pair explosion — shuffle rows bounded by the
    distinct-pair domain, never corpus tokens; (b) a 1-ROW argmax
    (TakeOrderedAndProject) that is localCheckpoint'd and broadcast
    back into the re-encode projection — the per-iteration driver
    materialization is one row, the graph.py lineage-truncation
    idiom, and the corpus itself is checkpointed per generation so
    generation g pays ONE corpus pass, not g (O(G) total passes —
    what a distributed BPE trainer pays; production systems batch
    multiple merges per re-encode pass to amortize further)."""
    docs = load_table(spark, sf_dir, "documents")
    soh, stx, sep = F.lit(_BPE_SOH), F.lit(_BPE_STX), F.lit(_BPE_SEP)
    cur = docs.select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), "(.)", _BPE_SOH + "$1" + _BPE_STX
        ).alias("s"),
    ).localCheckpoint(eager=True)
    gen_tables = []
    for g in range(1, BPE_TRAIN_GENS + 1):
        syms = _bpe_symbols(F.col("s"))
        # Guard: a 0/1-symbol document (empty or 1-char text) would make
        # sequence(1, size-1) DESCENDING ([1, 0]) and element_at(_sy, 0)
        # throw INVALID_INDEX_OF_ZERO; the oracle's range(1, len) is just
        # empty there, so dropping the row matches semantics exactly
        # (mirrors q_bpe_encode's length >= 2 guard).
        pairs = (
            cur.select(syms.alias("_sy"))
            .where(F.size("_sy") >= 2)
        ).select(
            F.explode(
                F.transform(
                    F.filter(
                        F.sequence(F.lit(1), F.size("_sy") - 1),
                        lambda i: (F.element_at("_sy", i) != " ")
                        & (F.element_at("_sy", i + 1) != " "),
                    ),
                    lambda i: F.concat(
                        F.element_at("_sy", i), sep, F.element_at("_sy", i + 1)
                    ),
                )
            ).alias("pk")
        )
        top = (
            pairs.groupBy("pk")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("pk"))
            .limit(1)
            .select(
                F.lit(g).alias("gen"),
                F.split_part("pk", sep, F.lit(1)).alias("left_sym"),
                F.split_part("pk", sep, F.lit(2)).alias("right_sym"),
                "c",
            )
            .localCheckpoint(eager=True)  # 1 row; ends this gen's lineage
        )
        gen_tables.append(top)
        cur = (
            cur.crossJoin(F.broadcast(top.select("left_sym", "right_sym")))
            .select(
                "doc_id",
                F.replace(
                    F.col("s"),
                    F.concat(
                        soh, F.col("left_sym"), stx,
                        soh, F.col("right_sym"), stx,
                    ),
                    F.concat(soh, F.col("left_sym"), F.col("right_sym"), stx),
                ).alias("s"),
            )
            .localCheckpoint(eager=True)  # one corpus pass per generation
        )
    from functools import reduce

    trajectory = reduce(lambda a, b: a.unionAll(b), gen_tables)
    return trajectory.select(
        F.col("gen").cast("int").alias("gen"),
        "left_sym",
        "right_sym",
        F.concat("left_sym", "right_sym").alias("merged"),
        F.col("c").cast("long").alias("n_pairs"),
    )


# -- Zipf law fit -------------------------------------------------------

#: How many top-frequency terms feed each source's log-log OLS fit.
ZIPF_TOP = 100


@query(
    "q_zipf_fit",
    oracle=f"""
    with tok as (
        select source, unnest(string_split(text, ' ')) as term
        from documents
    ),
    tf as (
        select source, term, count(*) as c
        from tok group by source, term
    ),
    ranked as (
        select source,
               ln(row_number() over (partition by source
                                     order by c desc, term)) as x,
               ln(c) as y
        from tf
        qualify row_number() over (partition by source
                                   order by c desc, term) <= {ZIPF_TOP}
    ),
    sums as (
        select source,
               cast(count(*) as double) as n,
               sum(x) as sx, sum(y) as sy,
               sum(x * y) as sxy, sum(x * x) as sxx
        from ranked group by source
    )
    select source,
           cast(n as bigint) as n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) as slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) as intercept
    from sums
    """,
    tags=("text", "llm", "quality", "stats"),
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source — OLS slope of ln(frequency) on
    ln(rank) over each source's top-100 terms. Natural language sits
    near slope -1 (Zipf); a corpus whose slope collapses toward 0 is
    template/boilerplate-heavy and one that steepens sharply is
    mode-collapsed — the corpus-health readout that complements
    q_ngram_diversity (type/token ratios) with a distribution-SHAPE
    statistic, standard in corpus-linguistics QA of training data.

    Determinism: ranks are integers (count desc, term tiebreak, both
    engines), ln of exact integers, and the closed-form OLS runs on
    per-source sums of <= ZIPF_TOP doubles — slope and intercept round
    6dp far above the accumulation error.

    Scale: the corpus collapses at the (source, term) count (map-side
    combined, vocab-bounded output); the rank window walks each
    source's VOCABULARY (sublinear in corpus size; at true web scale
    the same cut comes from a per-source count-histogram prefix, the
    operators/quantiles.py trick, since only the top-100 survive).
    Everything after the cut is O(sources x 100)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tf = (
        docs.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("c"), F.asc("term")
    )
    ranked = (
        tf.withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") <= ZIPF_TOP)
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    sums = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "source",
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )
