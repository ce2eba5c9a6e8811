"""HTML → Markdown linearization as one shared regex-chain definition.

The training-data shape of "extract the text" that KEEPS document
structure: headings, emphasis, links, list items and table cells survive
as Markdown markers instead of being flattened away (`webtext.py::
main_content` is the opposite tool — it deletes structure to score
density).  Modern corpus pipelines feed models Markdown because the
markers are cheap tokens that preserve the author's hierarchy.

One RULES table is the single source of truth; two emitters share it:

- ``html_to_markdown`` — a fold of JVM ``regexp_replace`` passes (plus
  literal entity replaces), whole-stage codegen, no Python in the path;
- ``html_to_markdown_sql`` — the identical chain as nested ANSI SQL for
  the oracle (DuckDB/RE2: ``\\1`` group refs, explicit ``'g'`` flag,
  real newline characters embedded in the literals).

Patterns are written to the RE2 subset (no backreferences — paired tags
are expanded per alternative), so Java and RE2 read them identically.

Scope (documented, deliberate): a linearizer, not a serializer — text is
not Markdown-escaped, nested blockquotes keep only their first marker,
and table cells join with ``|`` without column alignment.  Attribute
order for images handles the two conventional spellings (src-first and
alt-first).  Unknown tags drop; the 5 core entities decode (full entity
decoding is ``webtext.decode_entities``, composable upstream).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order.  Pattern must be RE2-safe.
# Replacement uses Java's $N syntax; the SQL emitter rewrites to \N.
_RULES: list[tuple[str, str]] = [
    # dead content first
    (r"(?is)<(?:script|style|noscript)[^>]*>.*?</(?:script|style|noscript)\s*>", ""),
    (r"(?s)<!--.*?-->", ""),
    # headings (expanded per level: RE2 has no backreferences)
    *[
        (
            rf"(?is)<h{i}[^>]*>(.*?)</h{i}\s*>",
            "\n\n" + "#" * i + " $1\n\n",
        )
        for i in range(1, 7)
    ],
    # inline emphasis / code (\b stops <b> matching <body>, <i> <img>, ...)
    (r"(?is)<(?:b|strong)\b[^>]*>(.*?)</(?:b|strong)\s*>", "**$1**"),
    (r"(?is)<(?:i|em)\b[^>]*>(.*?)</(?:i|em)\s*>", "*$1*"),
    (r"(?is)<code\b[^>]*>(.*?)</code\s*>", "`$1`"),
    # images before links (both conventional attribute orders)
    (r'(?is)<img[^>]*\bsrc="([^"]*)"[^>]*\balt="([^"]*)"[^>]*>', "![$2]($1)"),
    (r'(?is)<img[^>]*\balt="([^"]*)"[^>]*\bsrc="([^"]*)"[^>]*>', "![$1]($2)"),
    (r'(?is)<a\s[^>]*\bhref="([^"]*)"[^>]*>(.*?)</a\s*>', "[$2]($1)"),
    # list items, separators (\b stops <li> matching <link>, <br> <brX...>)
    (r"(?i)<li\b[^>]*>", "\n- "),
    (r"(?is)</li\s*>", ""),
    (r"(?is)<br\b[^>]*>", "\n"),
    (r"(?is)<hr\b[^>]*>", "\n\n---\n\n"),
    # blockquote: first-line marker only (nested prefixing is out of scope)
    (r"(?i)<blockquote\b[^>]*>", "\n\n> "),
    (r"(?is)</blockquote\s*>", "\n\n"),
    # table cells join with pipes, rows break lines (via the block list)
    (r"(?is)<(?:td|th)\b[^>]*>", "| "),
    (r"(?is)</(?:td|th)\s*>", " "),
    # block containers become paragraph breaks (\b stops <p> matching <pre>)
    (
        r"(?is)</?(?:p|div|section|article|header|footer|main|nav|aside|"
        r"figure|table|thead|tbody|tr|ul|ol)\b[^>]*>",
        "\n\n",
    ),
    # anything else drops
    (r"(?s)<[^>]*>", ""),
]

# literal entity decodes (applied after tag removal, && last)
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# whitespace normalization chain (regex again)
_WHITESPACE: list[tuple[str, str]] = [
    (r"[ \t]*\n[ \t]*", "\n"),  # trim around line breaks
    (r"\n{3,}", "\n\n"),  # at most one blank line
    (r"[ \t]{2,}", " "),  # collapse runs of spaces
    (r"^\s+|\s+$", ""),  # trim the document
]


def html_to_markdown(html: Column) -> Column:
    """Markdown linearization of an HTML string column — ~30 JVM regexp
    passes + 6 literal replaces, entirely whole-stage codegen."""
    out = html
    for pat, repl in _RULES:
        out = F.regexp_replace(out, pat, repl)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    for pat, repl in _WHITESPACE:
        out = F.regexp_replace(out, pat, repl)
    return out


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_repl(java_repl: str) -> str:
    # $N -> \N for RE2; real newlines embed directly in the literal
    out = java_repl
    for n in range(9, 0, -1):
        out = out.replace(f"${n}", f"\\{n}")
    return out


def html_to_markdown_sql(expr: str) -> str:
    """The identical chain as one nested SQL expression (oracle twin)."""
    out = expr
    for pat, repl in _RULES:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, {_sql_quote(_sql_repl(repl))}, 'g')"
    for ent, ch in _ENTITIES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    for pat, repl in _WHITESPACE:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, {_sql_quote(_sql_repl(repl))}, 'g')"
    return out
