"""Attribute-map actions — the contrib ``attributesprocessor`` semantics.

The reference distribution ships the contrib attributes processor
(distributions/elastic-components/manifest.yaml:48); its YAML `actions`
list is THE workhorse of collector pipelines — set a tenant tag, strip
a secret, hash a user id, split an URL path into attributes — executed
per record against the open attribute map.  Re-expressed here as a
spec-driven chain of pure map expressions over a
``map<string,string>`` column (the repo's pcommon.Map mapping,
SURVEY.md §1.3).

Supported actions (public processor semantics):

- ``insert``  — set ``key`` only when ABSENT (never overwrites)
- ``update``  — set ``key`` only when PRESENT
- ``upsert``  — always set
- ``delete``  — remove ``key``
- ``hash``    — replace the value with its SHA-256 hex (the contrib
  processor's non-deprecated hash function)
- ``convert`` — re-type the value in place; with string-valued maps
  this normalizes the FORMAT: ``int`` parses and reprints truncated,
  ``double`` reprints with a decimal point; unparseable values keep
  the original (the processor's no-op-on-failure behavior)
- ``extract`` — match ``pattern`` (with named capture groups, Java
  ``(?<name>...)`` or Python ``(?P<name>...)`` spelling) against the
  value and upsert one attribute per group THAT MATCHED

Value sources for insert/update/upsert: ``value`` (literal) or
``from_attribute`` (another key's current value; absent source -> the
action is a no-op, matching the processor).

Actions apply IN ORDER, each seeing the previous action's output —
same as the processor's action loop.  Scale shape: the whole chain is
one narrow projection of nested ``map_filter`` / ``map_concat`` /
``sha2`` / ``regexp_extract`` expressions fused into the scan — zero
UDFs, zero shuffles, whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _set(m: Column, key: str, val: Column) -> Column:
    """Unconditional set (the map may or may not contain key)."""
    return F.map_concat(
        F.map_filter(m, lambda k, _: k != key),
        F.map_from_arrays(F.array(F.lit(key)), F.array(val)),
    )


def _apply_one(m: Column, action: dict) -> Column:
    act = action["action"]
    key = action.get("key")
    if act == "delete":
        return F.map_filter(m, lambda k, _: k != key)
    if act == "hash":
        cur = F.element_at(m, key)
        return F.when(
            cur.isNotNull(), _set(m, key, F.sha2(cur.cast("binary"), 256))
        ).otherwise(m)
    if act == "convert":
        cur = F.element_at(m, key)
        to = action["converted_type"]
        if to == "int":
            # exact for full-range integer strings (a double round-trip
            # corrupts values above 2^53, e.g. 64-bit ids); the double
            # path only handles decimal strings ("12.9" -> "12")
            conv = F.coalesce(
                cur.try_cast("long"), cur.try_cast("double").cast("long")
            ).cast("string")
        elif to == "double":
            conv = cur.try_cast("double").cast("string")
        elif to == "string":
            conv = cur
        else:
            raise ValueError(f"unsupported converted_type {to!r}")
        return F.when(
            cur.isNotNull() & conv.isNotNull(), _set(m, key, conv)
        ).otherwise(m)
    if act == "extract":
        pattern = action["pattern"]
        # translate ONLY named-group syntax between the Java and Python
        # spellings: "(?<" or "(?P<" followed by a letter.  Lookbehinds
        # ("(?<=", "(?<!") must pass through untouched in both directions.
        py_pat = re.sub(r"\(\?P?<([A-Za-z])", r"(?P<\1", pattern)
        groups = re.compile(py_pat).groupindex
        if not groups:
            raise ValueError("extract pattern needs named capture groups")
        java_pat = re.sub(r"\(\?P<([A-Za-z])", r"(?<\1", pattern)
        cur = F.element_at(m, key)
        out = m
        for name, idx in groups.items():
            g = F.regexp_extract(F.coalesce(cur, F.lit("")), java_pat, idx)
            out = F.when(g != "", _set(out, name, g)).otherwise(out)
        return out
    if act in ("insert", "update", "upsert"):
        if "from_attribute" in action:
            val = F.element_at(m, action["from_attribute"])
        else:
            val = F.lit(str(action["value"]))
        has = F.map_contains_key(m, key)
        ok = val.isNotNull()
        if act == "insert":
            cond = ok & ~has
        elif act == "update":
            cond = ok & has
        else:
            cond = ok
        return F.when(cond, _set(m, key, val)).otherwise(m)
    raise ValueError(f"unknown action {act!r}")


def apply_attribute_actions(
    df: DataFrame, actions: list[dict], map_col: str = "attributes"
) -> DataFrame:
    """Run the action list in order against ``map_col`` (replacing it).
    See module docstring for the action vocabulary."""
    m = F.coalesce(
        F.col(map_col), F.create_map().cast("map<string,string>")
    )
    for action in actions:
        m = _apply_one(m, action)
    return df.withColumn(map_col, m)
