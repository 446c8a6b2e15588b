"""orjson-backed JSON with a stdlib fallback.

The kernel carries feature ids and tags as round-trip JSON strings
(``fid_json`` / ``tags_json``).  Every comparison against reference
goldens happens on the PARSED objects, so the byte formatting of these
internal strings is free to change — but the object kernel and the
batch SoA kernel must agree byte-for-byte with each other
(tests/test_vec_kernel.py), so both import THIS module.  orjson cuts
the convert stage's serialization cost ~8×; the stdlib fallback keeps
the package dependency-optional.

Not used for ``sources/corpus.py``'s extraction output: feature_json
strings there are part of the driver-oracle comparison and keep the
stdlib formatting the oracle SQL reproduces.
"""

from __future__ import annotations

try:
    import orjson as _orjson

    def loads(s):
        return _orjson.loads(s)

    def dumps(obj) -> str:
        return _orjson.dumps(obj).decode()

except ImportError:  # pragma: no cover - orjson present in this env
    import json as _json

    def loads(s):
        return _json.loads(s)

    def dumps(obj) -> str:
        return _json.dumps(obj)
