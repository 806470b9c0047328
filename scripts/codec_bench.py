"""Single-node codec head-to-head: engine kernel vs the reference library.

The reference's only published numbers are a read/write micro-benchmark
(README.md:136-151) whose write time required *disabling* antimeridian
cutting and winding checks. Here both codecs run the same workloads on the
same machine, same process, with full semantics on:

- parse: N synthesized GeoJSON documents (all 9 types);
- serialize: same trees with cutting + winding + bbox enabled (and the
  reference's published fast-path config for context).

The engine kernel is also pure Python per document (the Spark engine
parallelizes it across executors); the comparison isolates codec cost.
"""

import json
import os
import random
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def load_reference():
    shim = types.ModuleType("ujson")
    shim.loads = json.loads
    shim.load = json.load
    shim.dumps = lambda o, indent=None: json.dumps(o)
    sys.modules.setdefault("ujson", shim)
    sys.path.insert(0, "/root/reference")
    import picogeojson

    return picogeojson


def corpus(n_docs):
    """Same generator as the differential tests, restricted to docs BOTH
    codecs can serialize: the generator deliberately includes envelope-edge
    3-D documents on which both implementations raise identically (crash
    parity, see test_differential) — those can't contribute to a
    throughput number, so they are filtered here using the reference as
    the arbiter."""
    from test_differential import _rand_document  # same generator as tests

    pico = load_reference()
    rng = random.Random(77)
    docs = []
    while len(docs) < n_docs:
        d = json.dumps(_rand_document(rng))
        try:
            pico.tostring(pico.fromstring(d).raw)
        except Exception:  # noqa: BLE001 - crash-parity doc, skip
            continue
        docs.append(d)
    return docs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    docs = corpus(n)
    pico = load_reference()
    from picogeojson_spark.geo import dumps as eng_dumps
    from picogeojson_spark.geo import loads as eng_loads

    t0 = time.time()
    eng_trees = [eng_loads(d) for d in docs]
    eng_parse = time.time() - t0

    t0 = time.time()
    ref_trees = [pico.fromstring(d).raw for d in docs]
    ref_parse = time.time() - t0

    t0 = time.time()
    for t in eng_trees:
        eng_dumps(t)
    eng_ser = time.time() - t0

    t0 = time.time()
    for t in ref_trees:
        pico.tostring(t)
    ref_ser = time.time() - t0

    t0 = time.time()
    for t in eng_trees:
        eng_dumps(t, antimeridian_cutting=False, write_bbox=False)
    eng_ser_fast = time.time() - t0

    t0 = time.time()
    for t in ref_trees:
        pico.tostring(t, antimeridian_cutting=False, write_bbox=False)
    ref_ser_fast = time.time() - t0

    print(json.dumps({
        "n_docs": n,
        "parse_docs_per_sec": {"engine": round(n / eng_parse), "reference": round(n / ref_parse)},
        "serialize_full_docs_per_sec": {"engine": round(n / eng_ser), "reference": round(n / ref_ser)},
        "serialize_fastpath_docs_per_sec": {"engine": round(n / eng_ser_fast), "reference": round(n / ref_ser_fast)},
    }, indent=1))


if __name__ == "__main__":
    main()
