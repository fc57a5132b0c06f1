"""Serving-path tests: engine logic + live HTTP round-trip."""

import json
import threading
import urllib.request

import pytest

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.serve.engine import ServingEngine


@pytest.fixture(scope="module")
def model_cfg():
    return OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2, dropout=0.1),
        max_outfit_len=8,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def engine(model_cfg):
    import jax

    from outfitx_tpu.models import OutfitXModel

    data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=5)
    params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
    return ServingEngine(
        model_cfg=model_cfg,
        catalog=data.catalog,
        cp_params=params,
        cir_params=params,
    )


class TestEngine:
    def test_cp_score_in_unit_interval(self, engine):
        outfit = engine.sample_outfit(4)
        s = engine.cp_score(outfit)
        assert 0.0 <= s <= 1.0

    def test_cir_top10(self, engine):
        outfit = engine.sample_outfit(3)
        target = engine.sample_outfit(1)[0]
        items = engine.cir_top10(outfit, target)
        assert len(items) == 10
        scores = [i["score"] for i in items]
        assert scores == sorted(scores)  # ascending distance

    def test_fitb_pick_index(self, engine):
        outfit = engine.sample_outfit(3)
        cands = engine.sample_outfit(4)
        pick = engine.fitb_pick(outfit, cands)
        assert 0 <= pick < 4

    def test_mock_engine_needs_no_params(self, model_cfg):
        data = make_synthetic(n_items=100, d_embed=32, n_outfits=16, seed=6)
        eng = ServingEngine(model_cfg=model_cfg, catalog=data.catalog, mock=True)
        assert 0.0 <= eng.cp_score(eng.sample_outfit(3)) <= 1.0
        assert len(eng.cir_top10(eng.sample_outfit(3), eng.sample_outfit(1)[0])) == 10


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, engine):
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        httpd.shutdown()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def test_ui_and_sample(self, server):
        with urllib.request.urlopen(server + "/") as r:
            assert b"OutfitX-TPU demo" in r.read()
        with urllib.request.urlopen(server + "/api/sample?n=5") as r:
            sample = json.loads(r.read())
        assert len(sample["outfit"]) == 5

    def test_cp_cir_fitb_roundtrip(self, server, engine):
        outfit = engine.sample_outfit(4)
        cp = self._post(server + "/api/cp", {"outfit": outfit})
        assert 0.0 <= cp["score"] <= 1.0
        cir = self._post(
            server + "/api/cir", {"outfit": outfit[:3], "target": outfit[3]}
        )
        assert len(cir["items"]) == 10
        fitb = self._post(
            server + "/api/fitb",
            {"outfit": outfit[:2], "candidates": engine.sample_outfit(4)},
        )
        assert 0 <= fitb["pick"] < 4

    def test_bad_request_gets_400(self, server):
        req = urllib.request.Request(
            server + "/api/cp", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
            assert "missing field" in json.loads(e.read())["error"]
        assert raised
