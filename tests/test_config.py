"""W1 — deterministic key order (pywdcollections.py:73-75: the
reference sorts languages/properties to stabilize its query/cache
keys; here the same normalization stabilizes plan + cache keys)."""

from pywdcollections_spark.config import CollectionConfig, demo_config


def _cfg(props, templates):
    return CollectionConfig(name="t", properties=props, templates=templates)


def test_harvested_props_sorted_deduped_suffix_stripped():
    templates = {"enwiki": {
        "Infobox x": {"img": 18, "lat": "625a", "lon": "625b", "loc": 131},
        "Commonscat": 373,
    }}
    a = _cfg([625, 373, 18, 131], templates)
    b = _cfg([131, 18, 373, 625], templates)   # different declaration order
    got = a.harvested_props("enwiki")
    assert got == b.harvested_props("enwiki")          # order-insensitive
    assert got == sorted(set(got))                     # sorted, deduped
    assert "625" in got and "625a" not in got          # a/b suffix stripped


def test_template_map_rows_deterministic_across_dict_order():
    t1 = {"enwiki": {"A": {"x": 18, "y": 131}, "B": 373}}
    t2 = {"enwiki": {"B": 373, "A": {"y": 131, "x": 18}}}
    r1 = _cfg([18, 131, 373], t1).template_map_rows()
    r2 = _cfg([18, 131, 373], t2).template_map_rows()
    key = lambda r: tuple(sorted(r.items(), key=lambda kv: (kv[0], str(kv[1]))))
    assert sorted(map(key, r1)) == sorted(map(key, r2))


def test_demo_config_props_stable():
    assert demo_config().harvested_props("enwiki") == \
        demo_config().harvested_props("enwiki")
