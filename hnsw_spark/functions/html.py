"""HTML / markup stripping — the first step of a web-crawl curation
pipeline (raw HTML → clean text before quality scoring, dedup, and LM
filtering).

Pure Catalyst ``regexp_replace`` chains over the RE2∩Java regex subset
(non-greedy ``.*?`` with inline ``(?s)``, character classes — no
backreferences or lookaround), so the kernels fuse into the scan stage
(zero shuffles at any corpus size) and the DuckDB oracle replays them
byte-for-byte.  A real boilerplate extractor (trafilatura/jusText-class
DOM analysis) plugs in behind the same column contract; this tier is the
deterministic, engine-portable core every crawl pipeline runs first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: kill script/style bodies BEFORE generic tags, decode
# entities AFTER tags (so &lt;p&gt; does not become a strippable <p>)
_BLOCK_RE = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]+>"
ENTITIES = (
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_html(col: Column | str) -> Column:
    """Markup → clean text: drop script/style bodies and comments, replace
    every remaining tag with a space (tags are word boundaries:
    ``a<br>b`` must not fuse into ``ab``), decode the common entities,
    collapse whitespace runs, trim."""
    out = _col(col)
    out = F.regexp_replace(out, _BLOCK_RE, " ")
    out = F.regexp_replace(out, _COMMENT_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, rep in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def markup_ratio(col: Column | str) -> Column:
    """Fraction of the raw payload that is markup: 1 − len(clean)/len(raw)
    (0 for markup-free text, → 1 for tag soup).  The crawl-quality signal
    used to drop chrome-heavy pages before tokenization."""
    raw_len = F.length(_col(col))
    clean_len = F.length(strip_html(col))
    return F.when(raw_len == 0, F.lit(0.0)).otherwise(
        (1.0 - clean_len.cast("double") / raw_len.cast("double"))
    )
