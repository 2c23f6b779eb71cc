"""Production corpus-preparation pipeline (the CLI `prepare` surface).

Same seven-stage shape as the oracled ``corpus_prepare`` catalog query,
minus its test fixtures (no synthetic PII injection, benchmark set is a
caller-supplied table instead of a doc_id residue class):

    [optional] decontaminate vs a benchmark table (grams broadcast)
    -> PII email redaction (RE2, in place)
    -> language allow-list + quality threshold
    -> exact dedup keep-first (survivor ids broadcast)
    -> per-source cap (md5 order)
    -> fixed-size context-window chunking

One streaming DAG; the only driver folds are the two deliberately
small sides (benchmark n-grams, survivor ids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def prepare_corpus(
    docs,
    *,
    bench=None,
    ngram: int = 4,
    langs: tuple = ("en",),
    min_quality: float = 0.5,
    cap_per_source: int = 0,
    chunk_size: int = 512,
    chunk_stride: int = 384,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    dedup: str = "broadcast",
    c4_min_lines: int = 0,
    gopher: bool = False,
    line_dedup: bool = False,
    hygiene: bool = False,
    min_entropy_e6: int = 0,
    max_entropy_e6: int = 0,
    minhash_threshold: float = 0.8,
    exact_substr_k: int = 0,
    classifier_model=None,
    min_classifier_e6: int = 0,
):
    """documents Dataset -> (id, chunk_idx, chunk_text) Dataset.

    ``c4_min_lines > 0`` prepends the C4 page-cleaning stage (line
    rules + page rules; documents rewritten to their surviving lines,
    pages below the line floor dropped). ``gopher=True`` adds the
    Gopher word-statistics filter (paper-default bounds) after PII
    redaction. Both are zero-shuffle per-batch stages.

    ``line_dedup=True`` prepends CCNet-style corpus-wide line dedup
    (before C4): every line keeps only its globally-first occurrence
    and documents are rebuilt from their surviving lines (documents
    left with no lines drop out). Single-line corpora with no repeated
    lines pass through unchanged. ``min_entropy_e6``/``max_entropy_e6``
    (0 = off) band-filter on per-document character entropy (e6-integer
    bits via the frozen log2 artifact) after the quality threshold —
    the compression-style gibberish/boilerplate screen.
    ``hygiene=True`` drops documents carrying U+FFFD replacement
    characters or disallowed C0 control characters (the
    decode-corruption screen; evaluated on the redacted text alongside
    the lang/quality predicates, zero shuffle).
    ``exact_substr_k > 0`` adds ExactSubstr span removal (Lee et al.
    2021) on the filtered survivors before dedup: duplicated token runs
    >= k words are dropped from every document (docs left empty drop
    out); removing shared boilerplate first makes more near-identical
    texts exactly identical for the dedup pass.

    ``classifier_model`` (a (word, weight_e6) table from
    ``train_word_classifier``) adds the fastText/DCLM/FineWeb-style
    model-based quality filter: each doc's integer word-weight sum over
    the redacted text must reach ``min_classifier_e6`` (docs with no
    vocabulary hits score 0). The model broadcasts once via
    ``ray.put``; scoring is the shared ``classifier_score_values``
    kernel — vectorized, zero shuffle, applied with the other row-local
    predicates BEFORE dedup.

    ``dedup`` picks the exact-dedup survivor attachment:

    * ``broadcast`` (default) — survivor ids fold on the driver and
      broadcast once; right while the survivor set fits the object
      store (low duplicate rates, modest corpora).
    * ``join`` — the survivor-id Dataset semi-joins the corpus through
      Ray's native hash-shuffle join; the path for corpora whose
      survivor set is itself corpus-sized (at 100 TB, most texts are
      unique, so O(distinct texts) ids can't broadcast).
    * ``minhash`` — FUZZY dedup replaces the exact pass: MinHash+LSH
      near-dup pairs at ``minhash_threshold`` Jaccard over the prepped
      (redacted, filtered) text, distributed connected components, and
      the min-id survivor per component, all as Datasets end-to-end
      (exact duplicates are Jaccard 1, so this subsumes exact dedup for
      non-empty texts); survivors attach through the hash-shuffle
      semi-join like ``join``.
    """
    import pyarrow.compute as pc
    import ray

    from ..stages.corpus import _word_ngrams, cap_per_key, chunk_text
    from ..stages.dedup import exact_dedup_keep_first
    from ..stages.text import quality_score_values

    bench_ref = None
    if bench is not None:
        grams: set = set()
        for b in bench.select_columns([text_col]).iter_batches(
            batch_format="pyarrow"
        ):
            for text in b[text_col].to_pylist():
                if text:
                    grams |= _word_ngrams(text, ngram)
        bench_ref = ray.put(frozenset(grams))

    lang_set = set(langs)

    if line_dedup:
        from ..stages.lines import line_dedup as _line_dedup

        docs = _line_dedup(
            docs, text_col=text_col, id_col=id_col,
            carry_cols=(lang_col, source_col),
        )

    if c4_min_lines > 0:
        from ..stages.lines import c4_clean

        docs = c4_clean(
            docs, text_col=text_col, id_col=id_col,
            min_lines=c4_min_lines, carry_cols=(lang_col, source_col),
        )

    clf_ref = None
    if classifier_model is not None:
        clf_ref = ray.put((
            classifier_model["word"].combine_chunks(),
            classifier_model["weight_e6"].to_numpy(
                zero_copy_only=False
            ).astype(np.int64),
        ))

    ent_ref = None
    if min_entropy_e6 > 0 or max_entropy_e6 > 0:
        from ..stages.text import build_log2_table

        ent_ref = ray.put(
            np.concatenate(
                ([0],
                 build_log2_table()["l_e12"].to_numpy(zero_copy_only=False))
            ).astype(np.int64)
        )

    def prep(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], t.schema.field(id_col).type),
                source_col: pa.array([], pa.string()),
                text_col: pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        if bench_ref is not None:
            bg = ray.get(bench_ref)
            # explicit bool type: pa.array([]) from an empty list is
            # null-typed and Table.filter rejects it
            keep = pa.array(
                [not (_word_ngrams(x or "", ngram) & bg)
                 for x in t[text_col].to_pylist()],
                pa.bool_(),
            )
            t = t.filter(keep)
        if t.num_rows == 0:
            return empty
        text = pc.replace_substring_regex(
            t[text_col].combine_chunks(), EMAIL_PATTERN, "[EMAIL]"
        )
        score = quality_score_values(text)
        keep = pc.and_(
            pc.fill_null(
                pc.is_in(t[lang_col].combine_chunks(),
                         value_set=pa.array(sorted(lang_set))),
                False,
            ),
            pa.array(score >= min_quality),
        )
        if hygiene:
            keep = pc.and_(
                keep,
                pc.and_(
                    pc.equal(pc.count_substring(text, "�"), 0),
                    pc.equal(
                        pc.count_substring_regex(
                            text, r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
                        ),
                        0,
                    ),
                ),
            )
        if gopher:
            from ..stages.text import (
                GOPHER_MAX_MEAN_LEN_E6,
                GOPHER_MAX_WORDS,
                GOPHER_MIN_DISTINCT_STOP,
                GOPHER_MIN_MEAN_LEN_E6,
                GOPHER_MIN_WORDS,
                gopher_stats_values,
            )

            words, mean_e6, n_stop = gopher_stats_values(text)
            g_ok = (
                (words >= GOPHER_MIN_WORDS) & (words <= GOPHER_MAX_WORDS)
                & (mean_e6 >= GOPHER_MIN_MEAN_LEN_E6)
                & (mean_e6 <= GOPHER_MAX_MEAN_LEN_E6)
                & (n_stop >= GOPHER_MIN_DISTINCT_STOP)
            )
            keep = pc.and_(keep, pa.array(g_ok))
        out = pa.table(
            {id_col: t[id_col], source_col: t[source_col], text_col: text}
        ).filter(keep)
        if ent_ref is not None and out.num_rows:
            from ..stages.text import char_entropy_values

            # entropy runs AFTER the cheap filters, on survivors only:
            # an over-long doc the lang/quality rules already rejected
            # must not crash the log2-table bound (and rejected rows
            # shouldn't pay the decode)
            _, ent = char_entropy_values(out[text_col], ray.get(ent_ref))
            e_ok = np.ones(len(ent), dtype=bool)
            if min_entropy_e6 > 0:
                e_ok &= ent >= min_entropy_e6
            if max_entropy_e6 > 0:
                e_ok &= ent <= max_entropy_e6
            out = out.filter(pa.array(e_ok))
        if clf_ref is not None and out.num_rows:
            from ..stages.text import classifier_score_values

            vocab, weights = ray.get(clf_ref)
            # the kernel requires null-free text (a null survives the
            # quality filter at min_quality <= 0.3); null scores 0
            clf_score, _ = classifier_score_values(
                pc.fill_null(out[text_col].combine_chunks(), ""),
                vocab, weights,
            )
            out = out.filter(pa.array(clf_score >= min_classifier_e6))
        return out

    prepped = docs.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    if exact_substr_k > 0:
        # ExactSubstr span removal (Lee et al. 2021) on the filtered,
        # redacted survivors, BEFORE dedup (removing shared boilerplate
        # makes more near-identical texts exactly identical). emit_all
        # passes span-free docs through unchanged; docs left with no
        # tokens drop out.
        from ..stages.dedup import exact_substr_clean

        # the stage consumes its input twice (gram branch + text
        # branch of the doc-hash union); materialize the narrow
        # (id, source, text) survivors once so the whole upstream
        # filter chain does not re-execute per branch
        prepped = prepped.materialize()
        cleaned = exact_substr_clean(
            prepped, text_col, id_col, k=exact_substr_k,
            emit_all=True, carry_cols=(source_col,),
        )

        def rename(t: pa.Table) -> pa.Table:
            keep = pc.invert(pc.equal(
                pc.fill_null(t["clean_text"], ""), ""))
            t = t.filter(keep)
            return pa.table({
                id_col: t[id_col],
                source_col: t[source_col],
                text_col: t["clean_text"],
            })

        prepped = cleaned.map_batches(
            rename, batch_format="pyarrow", zero_copy_batch=True
        )

    def finish(survivors):
        if cap_per_source > 0:
            survivors = cap_per_key(
                survivors, key_col=source_col, id_col=id_col,
                n=cap_per_source, carry_cols=(text_col,),
            )
        return chunk_text(
            survivors, size=chunk_size, stride=chunk_stride,
            col=text_col, id_col=id_col,
        )

    if dedup == "minhash":
        from ..stages.components import (
            derive_join_partitions,
            near_dedup_survivors,
        )
        from ..stages.dedup import minhash_dedup_pairs

        pairs = minhash_dedup_pairs(
            prepped, col=text_col, id_col=id_col,
            threshold=minhash_threshold, as_dataset=True,
        )
        surv_ids = near_dedup_survivors(
            prepped, pairs, id_col, strategy="join"
        )
        parts = derive_join_partitions(prepped, surv_ids)
        # Arrow-normalize before the hash-shuffle join: upstream
        # shuffle stages can emit column-less empty blocks that the
        # join aggregator rejects (see near_dedup_survivors)
        return finish(prepped.join(
            surv_ids.repartition(parts),
            join_type="inner",
            num_partitions=parts,
            on=(id_col,),
        ))

    if dedup == "join":
        from ..stages.components import derive_join_partitions

        kept = exact_dedup_keep_first(prepped, key=text_col, id_col=id_col)
        return finish(prepped.join(
            kept,
            join_type="inner",
            num_partitions=derive_join_partitions(prepped, kept),
            on=(id_col,),
        ))
    if dedup != "broadcast":
        raise ValueError(f"unknown dedup strategy {dedup!r}")

    kept_parts = []
    for b in exact_dedup_keep_first(prepped, key=text_col, id_col=id_col).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if t.num_rows:
            kept_parts.append(t[id_col].combine_chunks())
    if not kept_parts:
        return prepped.map_batches(
            lambda t: pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    kept_ref = ray.put(pa.concat_arrays(kept_parts))

    def dedup_filter(t: pa.Table) -> pa.Table:
        import ray

        return t.filter(
            pc.is_in(t[id_col].combine_chunks(), value_set=ray.get(kept_ref))
        )

    return finish(prepped.map_batches(
        dedup_filter, batch_format="pyarrow", zero_copy_batch=True
    ))
