"""HTML main-content extraction (the trafilatura / jusText slot that
web-crawl pipelines run before any text filter — RefinedWeb §3.1,
C4 §2.2 both start from extracted text).

A real extractor is DOM-heuristic; this stage is the regex-level
equivalent over a deterministic rule chain, which keeps it fully
vectorized (one RE2 pass per rule over the whole batch) and
oracle-exact: pyarrow's ``replace_substring_regex`` and DuckDB's
``regexp_replace(..., 'g')`` are BOTH RE2, so the identical patterns
produce the identical text. RE2 has no lookahead, so every rule is
written with non-greedy spans instead.

Scale shape: pure ``map_batches``, zero shuffle, embarrassingly
parallel — the canonical first stage of a 100 TB crawl pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: applied in order; each (?s) span is non-greedy so unclosed tags
#: can't swallow the document
STRIP_RULES = (
    r"(?s)<head[^>]*>.*?</head>",            # title/meta/style/script block
    r"(?s)<script[^>]*>.*?</script>",        # body scripts
    r"(?s)<style[^>]*>.*?</style>",          # body styles
    r"(?s)<!--.*?-->",                       # comments
    r'(?s)<div class="(?:nav|footer)">.*?</div>',  # boilerplate blocks
)

#: fixed entity set, decoded in order. ``&amp;`` is decoded LAST — the
#: standard order: a double-escaped payload like ``&amp;lt;`` must
#: yield the literal text ``&lt;``, which amp-first would wrongly
#: decode a second time into ``<``.
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text(html) -> pa.Array:
    """Vectorized page -> main text: strip rule chain, drop remaining
    tags (replaced by a space so words never fuse), decode the fixed
    entity set, collapse whitespace, trim."""
    html = html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html
    out = html
    for pat in STRIP_RULES:
        out = pc.replace_substring_regex(out, pat, "")
    out = pc.replace_substring_regex(out, r"<[^>]+>", " ")
    for ent, ch in ENTITIES:
        out = pc.replace_substring(out, ent, ch)
    out = pc.replace_substring_regex(out, r"\s+", " ")
    return pc.utf8_trim(out, " ")


def html_extract(ds, *, html_col: str = "html", id_col: str = "doc_id"):
    """(id, text): extracted main text per page."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "text": extract_text(batch[html_col]),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
