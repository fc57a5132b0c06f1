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
