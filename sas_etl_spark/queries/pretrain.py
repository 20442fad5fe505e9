"""The capstone composite: a full pretraining-data pipeline as ONE
attested declarative plan (VERDICT r9 item 5).

Every stage is an already-attested lane — exact dedup (q_exact_dup),
near-dup cluster apply (q_neardup_apply), the Gopher quality gate
(q_gopher_rules), epoch-weighted mixture apply (q_mixture_apply),
deterministic epoch shuffle (q_epoch_shuffle), and sequence packing
(q_pack_sequences) — chained with NO intermediate materialization:
one logical DAG from the documents scan to the packed-shard audit,
with the oracle replaying the entire chain in a single WITH block.
This is the engine's actual product claim: the operators COMPOSE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.graph import connected_components
from sas_etl_spark.operators.minhash import (
    jaccard,
    near_dup_pairs,
    shingle_array,
)
from sas_etl_spark.operators.sampling import hash_bucket
from sas_etl_spark.operators.text import token_count_bpe_ish
from sas_etl_spark.queries.cube_sample import (
    MIX_APPLY_EXTRA,
    MIX_BUDGET_X,
    MIX_RESID_SEED,
    MIX_SHUFFLE_SEED,
    MIX_SHUFFLE_SPACE,
    MIX_W_HIGH,
    MIX_W_LOW,
    MIX_W_MID,
)
from sas_etl_spark.queries.quality_gates import (
    GOPHER_MAX_DUP_FRAC,
    GOPHER_MAX_TOKENS,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_TOKENS,
    GOPHER_MIN_WLEN,
    GOPHER_MAX_WLEN,
    _STOPWORDS,
)
from sas_etl_spark.registry import query

#: Near-dup decision threshold — q_neardup_apply's (exact Jaccard on
#: 3-gram word shingles, 6dp-rounded at the cross-engine boundary).
NEARDUP_THRESHOLD = 0.2

#: PRODUCTION near-dup threshold (q_pretrain_pipeline_prod): the
#: operating point real pretraining dedup runs at (GPT-3 / Gopher /
#: RefinedWeb use ~0.8 MinHash similarity), where LSH banding is
#: essentially lossless — 32 bands x 4 rows recall 1 - (1-0.8^4)^32
#: ~ 1 - 5e-8 — so the sub-quadratic candidate path IS the exact
#: relation.
PROD_NEARDUP_THRESHOLD = 0.8

#: Context-window token budget per packed sequence (q_pack_sequences).
PACK_BUDGET = 512

#: Number of training shards the shuffled multiset packs into.
PACK_SHARDS = 8

#: Engine-portable seeded hash idioms (operators/sampling.hash_bucket
#: as DuckDB SQL): residual-epoch membership and the shuffle key.
_SQL_RESID = f"""list_reduce(list_transform(range(1,16),
            j -> strpos('0123456789abcdef',
                        substr(sha256('{MIX_RESID_SEED}:'
                                      || cast(d.doc_id as varchar)),
                               j, 1)) - 1),
          (a,x) -> a*16+x) % 1000000"""
_SQL_SHUFKEY = f"""list_reduce(list_transform(range(1,16),
            j -> strpos('0123456789abcdef',
                        substr(sha256('{MIX_SHUFFLE_SEED}:'
                                      || cast(doc_id as varchar)
                                      || '#' || cast(e as varchar)),
                               j, 1)) - 1),
          (a,x) -> a*16+x) % {MIX_SHUFFLE_SPACE}"""


def _pretrain_oracle(threshold: float) -> str:
    """The full-chain DuckDB replay, parameterized by the near-dup
    edge threshold — shared verbatim by the test-SF composite
    (exact edges at {NEARDUP_THRESHOLD}) and the production composite
    (LSH edges at {PROD_NEARDUP_THRESHOLD}); the oracle's edge stage
    is ALWAYS the exact all-pairs Jaccard (ground truth), which is
    what makes the prod registration meaningful: the driver hash
    proves the sub-quadratic LSH candidate path reproduces the exact
    relation at its operating point."""
    return rf"""
    with recursive
    kept1 as (
        select min(doc_id) as doc_id from documents group by text
    ),
    d1 as (
        select d.doc_id, d.source, d.text
        from documents d join kept1 k on k.doc_id = d.doc_id
    ),
    sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1)
                            + 1),
                   i -> array_to_string(
                            (string_split(text, ' '))[i:i+2], ' '))) as s
        from d1
    ),
    pairs as (
        select a.doc_id as a_id, b.doc_id as b_id
        from sh a, sh b
        where a.doc_id < b.doc_id
          and round(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))), 6)
              >= {threshold}
    ),
    edges as (
        select a_id as u, b_id as v from pairs
        union all
        select b_id as u, a_id as v from pairs
    ),
    reach(u, v) as (
        select u, v from edges
        union
        select r.u, e.v from reach r join edges e on r.v = e.u
    ),
    dropped as (
        select u as doc_id from reach
        group by u having least(u, min(v)) <> u
    ),
    d2 as (
        select * from d1
        where doc_id not in (select doc_id from dropped)
    ),
    gm as (
        select doc_id, source, text,
               cast(len(toks) as bigint) as n_tokens,
               length(replace(text, ' ', '')) * 1.0 / len(toks)
                   as mean_wlen,
               len(list_filter(toks,
                   x -> list_contains({list(_STOPWORDS)!r}, x))) as n_stop,
               1 - len(list_distinct(toks)) * 1.0 / len(toks) as dup_frac
        from (select doc_id, source, text,
                     string_split(text, ' ') as toks from d2) t
    ),
    d3 as (
        select doc_id, source, text from gm
        where n_tokens between {GOPHER_MIN_TOKENS} and {GOPHER_MAX_TOKENS}
          and mean_wlen between {GOPHER_MIN_WLEN} and {GOPHER_MAX_WLEN}
          and n_stop >= {GOPHER_MIN_STOPWORDS}
          and dup_frac <= {GOPHER_MAX_DUP_FRAC}
    ),
    w as (
        select source, count(*) as n_avail,
               case when cast(substr(source, 4) as int) < 5
                        then {MIX_W_HIGH}
                    when cast(substr(source, 4) as int) < 10
                        then {MIX_W_MID}
                    else {MIX_W_LOW} end as w
        from d3 group by source
    ),
    tot as (
        select sum(n_avail) * {MIX_BUDGET_X} + {MIX_APPLY_EXTRA} as t_total
        from w
    ),
    plan2 as (
        select source, n_avail,
               tgt // n_avail as full_epochs,
               cast(tgt % n_avail as hugeint) * 1000000 // n_avail
                   as residual_ppm
        from (select source, n_avail,
                     cast(w as hugeint) * t_total // 1000 as tgt
              from w cross join tot)
    ),
    perdoc as (
        select d.doc_id, d.text,
               cast(p.full_epochs
                 + (case when {_SQL_RESID} < p.residual_ppm
                         then 1 else 0 end) as bigint) as copies
        from d3 d join plan2 p on p.source = d.source
    ),
    multiset as (
        select doc_id, text, unnest(range(1, copies + 1)) as e
        from perdoc where copies >= 1
    ),
    keyed as (
        select doc_id, e,
               len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) as n_tok,
               {_SQL_SHUFKEY} as k
        from multiset
    ),
    cums as (
        select k % {PACK_SHARDS} as shard, n_tok, k,
               sum(n_tok) over (partition by k % {PACK_SHARDS}
                                order by k, e, doc_id
                                rows between unbounded preceding
                                and current row) as cum
        from keyed
    )
    select cast(shard as bigint) as shard,
           cast((cum - n_tok) // {PACK_BUDGET} as bigint) as seq_id,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_tok) as bigint) as total_tokens,
           cast(sum(k % 1000003) as bigint) as key_modsum
    from cums
    group by shard, seq_id
    """


@query(
    "q_pretrain_pipeline",
    oracle=_pretrain_oracle(NEARDUP_THRESHOLD),
    tags=("llm", "dedup", "quality", "sample", "pack", "composite"),
)
def q_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data pipeline as ONE declarative DAG —
    exact dedup -> near-dup cluster apply -> Gopher quality gate ->
    epoch-weighted mixture apply -> deterministic epoch shuffle ->
    sequence packing — with no intermediate materialization; the
    oracle replays the identical chain in a single WITH block, so the
    driver hash attests that the attested lanes COMPOSE (the engine's
    product claim), not just that each works alone.

    Stage semantics are the registered single-lane queries', verbatim:
    keep-first exact dedup (min doc_id per distinct text, q_exact_dup
    keep rule); near-dup drop of non-representative cluster members
    (3-gram-shingle exact Jaccard >= {NEARDUP_THRESHOLD} edges ->
    connected components, q_neardup_apply); the 4-rule Gopher gate on
    raw metric values (q_gopher_rules); the 2x+{MIX_APPLY_EXTRA}
    tiered mixture with seeded residual-epoch membership
    (q_mixture_apply); seeded shuffle keys per (doc, epoch) copy
    (q_epoch_shuffle); and concat-and-chunk packing at {PACK_BUDGET}
    tokens — here packing concatenates in the SHUFFLED order (shard =
    key mod {PACK_SHARDS}, cum-sum ordered by key), i.e. the packer
    consumes the training order the shuffle defines, which is how the
    stages actually compose in production.

    Attested payload: per (shard, seq_id) document/token counts plus
    the modular key sum — every upstream decision flows into it (a
    wrongly kept/dropped/gated doc shifts the multiset, the keys, and
    every packing boundary after it), so one hash covers the chain
    end to end.

    Scale: the near-dup EDGE stage here is the exact all-pairs scorer
    and inherits q_dup_clusters' ground-truth/test-SF-only contract —
    at 100 TB the edges come from the LSH candidate generators
    (near_dup_pairs) with everything downstream unchanged. The rest
    of the chain is scan-side flags + an O(sources) broadcast plan +
    scan-side explode + a partitioned window per shard: no global
    sort, no funnel; the composed plan's exchanges are the UNION of
    the lanes' own (audited by tests/test_plan_audit.py), not a new
    shape."""
    d1 = _exact_dedup(load_table(spark, sf_dir, "documents"))
    # stage 2 (test-SF ground-truth contract): exact all-pairs Jaccard
    # edges — the production composite swaps ONLY this relation
    sh = d1.select("doc_id", shingle_array(F.col("text")).alias("_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("_sh").alias("_sb"))
    pairs = (
        a.join(b, a.a_id < b.b_id)
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("_sa"), F.col("_sb")), 6).alias("_j"),
        )
        .filter(F.col("_j") >= NEARDUP_THRESHOLD)
        .select("a_id", "b_id")
    )
    return _pipeline_from_edges(d1, pairs)


def _exact_dedup(docs: DataFrame) -> DataFrame:
    """Stage 1: keep-first exact dedup (the q_exact_dup keep rule)."""
    docs = docs.select("doc_id", "source", "text")
    kept1 = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    return docs.join(kept1, "doc_id", "left_semi")


def _pipeline_from_edges(d1: DataFrame, pairs: DataFrame) -> DataFrame:
    """Stages 2b-6 of the composite, downstream of the near-dup EDGE
    relation: connected components -> drop non-representatives ->
    Gopher gate -> mixture plan+apply -> epoch shuffle -> packing.
    Shared VERBATIM by the test-SF composite (exact edges) and the
    production composite (LSH edges) — the 'everything downstream
    unchanged' contract, enforced by code identity rather than
    review."""
    dropped = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    d2 = d1.join(dropped, "doc_id", "left_anti")
    # stage 3: Gopher gate on raw metric values
    toks = F.split("text", " ")
    gm = d2.select(
        "doc_id",
        "source",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.length(F.translate("text", " ", "")) * F.lit(1.0) / F.size(toks)
        ).alias("mean_wlen"),
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        (1 - F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)).alias(
            "dup_frac"
        ),
    )
    d3 = gm.filter(
        F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
        & F.col("mean_wlen").between(GOPHER_MIN_WLEN, GOPHER_MAX_WLEN)
        & (F.col("n_stop") >= GOPHER_MIN_STOPWORDS)
        & (F.col("dup_frac") <= GOPHER_MAX_DUP_FRAC)
    ).select("doc_id", "source", "text")
    # stage 4: mixture plan over the SURVIVING corpus + apply
    idx = F.substring("source", 4, 10).cast("int")
    w = (
        d3.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn(
            "w",
            F.when(idx < 5, F.lit(MIX_W_HIGH))
            .when(idx < 10, F.lit(MIX_W_MID))
            .otherwise(F.lit(MIX_W_LOW)),
        )
    )
    tot = w.agg(
        (F.sum("n_avail") * MIX_BUDGET_X + MIX_APPLY_EXTRA).alias("t_total")
    )
    plan = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_rows",
            F.expr("cast(w as decimal(38,0)) * t_total div 1000"),
        )
        .select(
            "source",
            F.expr("target_rows div n_avail").alias("full_epochs"),
            F.expr(
                "cast(target_rows % n_avail as decimal(38,0))"
                " * 1000000 div n_avail"
            ).alias("residual_ppm"),
        )
    )
    resid = hash_bucket("doc_id", 1_000_000, seed=MIX_RESID_SEED)
    copies = F.col("full_epochs") + F.when(
        resid < F.col("residual_ppm"), F.lit(1)
    ).otherwise(F.lit(0))
    # stages 5+6: explode the multiset, key it (shuffle), pack in
    # shuffled order at the token budget
    keyed = (
        d3.join(F.broadcast(plan), "source")
        .withColumn("copies", copies)
        .filter(F.col("copies") >= 1)
        .withColumn("e", F.explode(F.sequence(F.lit(1), F.col("copies"))))
        .select(
            "doc_id",
            "e",
            token_count_bpe_ish(F.col("text")).alias("n_tok"),
            hash_bucket(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("e").cast("string"),
                ),
                MIX_SHUFFLE_SPACE,
                seed=MIX_SHUFFLE_SEED,
            ).alias("k"),
        )
    )
    pack_w = (
        Window.partitionBy("shard")
        .orderBy("k", "e", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = keyed.withColumn("shard", F.col("k") % PACK_SHARDS).withColumn(
        "cum", F.sum("n_tok").over(pack_w)
    )
    return (
        cums.withColumn(
            "seq_id", F.expr(f"(cum - n_tok) div {PACK_BUDGET}")
        )
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.col("k") % 1000003).alias("key_modsum"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("seq_id").cast("long").alias("seq_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("key_modsum").cast("long").alias("key_modsum"),
        )
    )


@query(
    "q_pretrain_pipeline_prod",
    oracle=_pretrain_oracle(PROD_NEARDUP_THRESHOLD),
    tags=("llm", "dedup", "quality", "sample", "pack", "composite", "scale"),
)
def q_pretrain_pipeline_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-posture pretraining composite (VERDICT r11 item
    1): identical chain to q_pretrain_pipeline — exact dedup ->
    near-dup cluster apply -> Gopher gate -> mixture apply -> epoch
    shuffle -> packing, all downstream stages the SAME code object
    (_pipeline_from_edges) — but the near-dup EDGE stage is the
    sub-quadratic scale path: MinHash-LSH candidates + exact-Jaccard
    verify (operators/minhash.near_dup_pairs, the q_near_dup_minhash
    lane) at the production threshold {PROD_NEARDUP_THRESHOLD}.

    Why this registration exists: the test-SF composite's exact
    all-pairs edge scorer is the right GROUND-TRUTH twin but the plan
    that dies at 100 TB; no sub-quadratic exact path exists at its
    0.2 threshold (32x4 banding recalls ~5% there — SCALE.md r10).
    At the threshold real pretraining dedup actually runs (~0.8,
    GPT-3/Gopher/RefinedWeb), 32 bands x 4 rows recall
    1 - (1 - 0.8^4)^32 ~ 1 - 5e-8 and every candidate is
    exact-verified — so the LSH plan computes the exact relation, and
    the driver hash PROVES it: the oracle's edge stage is the exact
    all-pairs join at {PROD_NEARDUP_THRESHOLD} (ground truth), the
    Spark side never compares all pairs. This is the attested plan
    you would run at 100 TB.

    Scale: candidates are band-hash-bucket bounded (never all-pairs);
    signatures are one scan-side Project; everything downstream is
    the already-audited composite shape (scan-side flags, O(sources)
    broadcast plan, partitioned windows). Growth rows at sf0.1/sf1 in
    SCALE.md r12 demonstrate the sub-quadratic edge cost where the
    exact composite could not run."""
    d1 = _exact_dedup(load_table(spark, sf_dir, "documents"))
    pairs = near_dup_pairs(
        d1, threshold=PROD_NEARDUP_THRESHOLD
    ).select("a_id", "b_id")
    return _pipeline_from_edges(d1, pairs)
