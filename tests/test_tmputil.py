"""Property pins for the temp-artifact tag (r9/r10 ADVICE chain):
injective across paths, identifier-safe, and bounded in length even
for deeply nested corpora — the tag feeds both filesystem paths and
unquoted SQL identifiers (bucketed table DDL)."""

from __future__ import annotations

import re

from document_query_system_spark.sources.tmputil import dir_tag


def test_dir_tag_bounded_for_deep_paths():
    """A deeply nested absolute path must not grow the identifier:
    the readable prefix is capped to the last two components and the
    whole tag stays far under metastore name caps (Hive's tightest
    default is 128)."""
    deep = "/" + "/".join(f"level_{i:02d}" for i in range(40)) + "/sf0.01"
    tag = dir_tag(deep)
    assert len(tag) <= 65, tag  # 48 prefix + '_' + 16 hex
    assert tag.endswith(tuple("0123456789abcdef"))
    assert re.fullmatch(r"[A-Za-z0-9_.]+", tag), tag


def test_dir_tag_injective_where_prefix_collides():
    """Paths that collapse to the same readable prefix (the '/'→'_'
    fold, the two-component cap, same tail under different roots)
    must still get distinct tags — the sha1 suffix carries uniqueness
    now that the prefix is capped (r10 ADVICE: widened to 16 hex)."""
    cases = [
        "/a/b_c",
        "/a_b/c",
        "/root/testdata/sf0.01",
        "/other/testdata/sf0.01",
        "/x/" + "p/" * 30 + "testdata/sf0.01",
        "/root/testdata/sf0.01/",  # trailing slash normalizes equal
    ]
    tags = [dir_tag(p) for p in cases]
    assert tags[-1] == dir_tag("/root/testdata/sf0.01")  # normalized
    distinct = tags[:-1]
    assert len(set(distinct)) == len(distinct), distinct
    suffixes = {t.rsplit("_", 1)[-1] for t in distinct}
    assert all(len(s) == 16 for s in suffixes), suffixes
