"""Raw-slice JSON scanner laws (functions/jsonraw.py) + the dialect
binding for JSONExtractArrayRaw / JSONExtractKeysAndValuesRaw (r9,
VERDICT r8 item 6). The scanner is also differential-checked against
DuckDB's independent json_extract in test_dialect_differential.py.
"""

from __future__ import annotations

import pytest

from clickhouse_learning_spark.functions.jsonraw import (
    object_keys_values_raw,
    split_json_array_raw,
)


def test_array_raw_slices():
    assert split_json_array_raw('[1,"a",{"b":2},[3,4],null,true]') == [
        "1", '"a"', '{"b":2}', "[3,4]", "null", "true"
    ]
    # whitespace between elements is not part of the raw slice
    assert split_json_array_raw(' [ 1 , "a b" ] ') == ["1", '"a b"']
    assert split_json_array_raw("[]") == []
    # escapes inside strings hide structural characters
    assert split_json_array_raw('["a\\"]b","c,d","e\\\\"]') == [
        '"a\\"]b"', '"c,d"', '"e\\\\"'
    ]
    # nested composites keep their full raw extent
    assert split_json_array_raw('[{"a":[1,{"b":"]"}]},2]') == [
        '{"a":[1,{"b":"]"}]}', "2"
    ]


def test_array_raw_type_default_on_non_array():
    # ClickHouse returns [] when the input is not a JSON array
    for bad in (None, "", "notjson", '{"a":1}', '"str"', "1",
                "[1,2", "[1,]x", "[1 2]", "[,]"):
        assert split_json_array_raw(bad) == [], bad


def test_object_kv_raw():
    assert object_keys_values_raw('{"x":1,"y":"s","z":{"w":[1]}}') == [
        ("x", "1"), ("y", '"s"'), ("z", '{"w":[1]}')
    ]
    assert object_keys_values_raw("{}") == []
    # escaped key decodes; raw value text is untouched
    assert object_keys_values_raw('{"a\\"b": [1, 2]}') == [
        ('a"b', "[1, 2]")
    ]
    for bad in (None, "[1]", "{", '{"a"}', '{"a":}', '{"a":1,}', "x"):
        assert object_keys_values_raw(bad) == [], bad


def test_dialect_binding(spark):
    from clickhouse_learning_spark.functions.dialect import translate

    r = spark.sql(translate(
        "SELECT JSONExtractArrayRaw('[1,\"a\",null]') AS a, "
        "JSONExtractArrayRaw('{\"k\":[{\"x\":1},2]}', 'k') AS sub, "
        "arrayMap(t -> concat(t.1, '=', t.2), "
        "JSONExtractKeysAndValuesRaw('{\"p\":1,\"q\":[2]}')) AS kv"
    )).collect()[0]
    assert r["a"] == ["1", '"a"', "null"]
    assert r["sub"] == ['{"x":1}', "2"]
    assert r["kv"] == ["p=1", "q=[2]"]
    with pytest.raises(ValueError, match="simdjson"):
        translate("SELECT JSONType('[1]')")
    with pytest.raises(ValueError, match="multi-key"):
        translate(
            "SELECT JSONExtractArrayRaw(x, concat('a', 'b'), 'c') "
            "FROM t"
        )