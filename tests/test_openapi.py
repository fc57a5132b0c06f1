"""/api/openapi.json stays in lockstep with the handler's route table
(the reference demo exposes no machine-readable contract; ours is tested)."""

import json
import threading
import urllib.request

import pytest

from outfitx_tpu.serve.openapi import build_spec


def test_spec_paths_match_handler_routes():
    """Every JSON-API route the handler accepts is documented, and the spec
    documents nothing the handler would 404."""
    from outfitx_tpu.serve.app import make_handler

    class _Eng:  # route-table access only; no engine calls
        mock = True

    handler = make_handler(_Eng())
    served = set(handler._ROUTES) - {"/", "/images", "/api/sample"}
    spec_paths = set(build_spec()["paths"])
    assert {"/images/{item_id}.jpg", "/api/sample"} <= spec_paths
    assert (spec_paths - {"/images/{item_id}.jpg", "/api/sample"}) == served
    # methods declared match the handler's verb split
    posts = {p for p, ops in build_spec()["paths"].items() if "post" in ops}
    assert posts == {
        "/api/cp", "/api/cp_batch", "/api/cir", "/api/fitb",
        "/api/update_items", "/api/add_items",
    }


def test_declared_error_codes_match_handler_behavior():
    """The spec declares exactly the statuses the handler can emit per
    route (app.make_handler: missing fields -> 400, UnknownItemError /
    absent split -> 404, last-resort -> 500) — a generated client's error
    model must not invent a 400 for /api/health or miss /api/similar's
    404."""
    paths = build_spec()["paths"]
    declared = {
        p: set(op["responses"])
        for p, ops in paths.items()
        for op in ops.values()
    }
    for p, codes in declared.items():
        assert "200" in codes, p
        # every route, including the raw-bytes image route, falls through to
        # _timed's JSON-wrapped last-resort 500 (app.py)
        assert "500" in codes, p
    # ops routes cannot reject anything
    for p in ("/api/health", "/api/stats", "/api/openapi.json"):
        assert not declared[p] & {"400", "404"}, p
    # browse samplers 404 on a missing split but never 400 (bad n clamps)
    for p in ("/api/sample_cp", "/api/sample_cir", "/api/sample_fitb"):
        assert "404" in declared[p] and "400" not in declared[p], p
    assert not declared["/api/sample"] & {"400", "404"}
    # unknown item ids 404 on every id-consuming route
    for p in ("/api/cp", "/api/cp_batch", "/api/cir", "/api/fitb",
              "/api/similar", "/api/update_items"):
        assert {"400", "404"} <= declared[p], p
    # add_items only introduces ids: duplicates/capacity are 400s, never 404
    assert "400" in declared["/api/add_items"]
    assert "404" not in declared["/api/add_items"]


@pytest.fixture(scope="module")
def mock_server():
    from http.server import ThreadingHTTPServer

    from outfitx_tpu.serve.app import build_engine, make_handler

    engine = build_engine(mock=True, synthetic=True)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_openapi_served(mock_server):
    with urllib.request.urlopen(f"{mock_server}/api/openapi.json") as r:
        assert r.status == 200
        spec = json.loads(r.read())
    assert spec["openapi"].startswith("3.0")
    assert spec["info"]["title"] == "outfitx_tpu serving API"
    assert "/api/cp" in spec["paths"]
