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

    def test_cp_score_batch_matches_single(self, engine):
        import numpy as np

        outfits = [engine.sample_outfit(n) for n in (2, 3, 4, 5, 3)]
        batch = engine.cp_score_batch(outfits)
        assert len(batch) == 5
        singles = [engine.cp_score(o) for o in outfits]
        np.testing.assert_allclose(batch, singles, atol=1e-5)
        assert engine.cp_score_batch([]) == []

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
        # every public surface must be model-free in mock mode (the UI
        # exposes them all; no jitted task programs exist here)
        assert len(eng.similar_items(eng.sample_outfit(1)[0], k=5)) == 5
        assert 0 <= eng.fitb_pick(eng.sample_outfit(3), eng.sample_outfit(4)) < 4
        assert eng.cp_score_batch([eng.sample_outfit(2)])


class TestRetrievalRouting:
    """The whole-catalog retriever routes by scale: dense -> quantized ->
    chunk-streamed; all three must agree on the same neighbours."""

    def _engine(self, model_cfg, **kw):
        import jax

        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=5)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        return ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            pools=None,
            warmup=False,
            **kw,
        )

    def test_dense_vs_chunked_agree(self, model_cfg):
        import numpy as np

        dense = self._engine(model_cfg)
        # chunk_threshold below n_items forces the lax.scan streaming route
        chunked = self._engine(model_cfg, chunk_threshold=128)
        item = dense.sample_outfit(1)[0]
        a = dense.similar_items(item, k=5)
        b = chunked.similar_items(item, k=5)
        assert [x["item_id"] for x in a] == [x["item_id"] for x in b]
        np.testing.assert_allclose(
            [x["score"] for x in a], [x["score"] for x in b], rtol=1e-5
        )

    def test_quantized_route(self, model_cfg):
        quant = self._engine(model_cfg, quantized=True)
        assert quant._qcat is not None
        items = quant.similar_items(quant.sample_outfit(1)[0], k=5)
        assert len(items) == 5
        # int8 is approximate; top-10 must still come back sorted
        outfit = quant.sample_outfit(3)
        out = quant.cir_top10(outfit, quant.sample_outfit(1)[0])
        scores = [i["score"] for i in out]
        assert scores == sorted(scores)

    def test_cir_chunked_route(self, model_cfg):
        dense = self._engine(model_cfg)
        chunked = self._engine(model_cfg, chunk_threshold=100)
        outfit = dense.sample_outfit(3)
        target = dense.sample_outfit(1)[0]
        a = dense.cir_top10(outfit, target)
        b = chunked.cir_top10(outfit, target)
        assert [x["item_id"] for x in a] == [x["item_id"] for x in b]

    @pytest.mark.parametrize("quantized", [False, True])
    @pytest.mark.parametrize("chunk_threshold", [262_144, 100])
    @pytest.mark.parametrize("approx", [False, True])
    def test_route_matrix(self, model_cfg, quantized, chunk_threshold, approx):
        """Full {dense, int8} x {materialized, chunked} x {exact, approx}
        matrix: every combination must return the same neighbours as its
        dtype's exact dense baseline (approx_max_k and the chunked exact
        merge are lossless on the CPU test backend)."""
        baseline = self._engine(model_cfg, quantized=quantized)
        eng = self._engine(
            model_cfg,
            quantized=quantized,
            chunk_threshold=chunk_threshold,
            approx_topk=approx,
        )
        item = baseline.sample_outfit(1)[0]
        a = baseline.similar_items(item, k=5)
        b = eng.similar_items(item, k=5)
        assert [x["item_id"] for x in a] == [x["item_id"] for x in b]
        import numpy as np

        np.testing.assert_allclose(
            [x["score"] for x in a], [x["score"] for x in b], rtol=1e-5,
            atol=1e-5,
        )


class TestWarmup:
    """Startup warmup must compile EVERY task program: a first request after
    init must not trigger a fresh trace/compile (1-7 min per program behind
    a remote compile service)."""

    _PROGRAMS = (
        "_cp_task", "_cir_task", "_cir_pool_task", "_fitb_task", "_sim_task"
    )

    def _cache_sizes(self, eng):
        return {n: getattr(eng, n)._cache_size() for n in self._PROGRAMS}

    def _make(self, model_cfg, with_pools):
        import jax

        from outfitx_tpu.data.sampler import CandidatePools
        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=5)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        pools = (
            CandidatePools.build(
                data.catalog, data.cir_valid, pool_size=64, threshold=1, seed=0
            )
            if with_pools
            else None
        )
        return ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            pools=pools,
        )

    @pytest.mark.parametrize("with_pools", [False, True])
    def test_no_recompile_after_warmup(self, model_cfg, with_pools):
        eng = self._make(model_cfg, with_pools)
        before = self._cache_sizes(eng)
        assert all(v >= 1 for n, v in before.items() if n != "_cir_pool_task"), before
        ids = eng.sample_outfit(4)
        eng.cp_score(ids)
        eng.cp_score_batch([ids[:2], ids[2:]])  # pads to the warmed bucket
        # any request size chunks into the SAME bucket (ADVICE r3: the
        # browse endpoints' n<=32 must never hit a fresh compile)
        eng.cp_score_batch([ids] * (eng.cp_batch_bucket * 2 + 3))
        eng.cir_top10(ids[:3], ids[3])
        eng.fitb_pick(ids[:3], ids[:4])
        eng.similar_items(ids[0])
        # coalesced-batch surfaces hit the warmed bucket programs too
        eng.cir_top10_batch(
            [(ids[:2], ids[2])] * (eng.cp_batch_bucket + 1)
        )
        eng.similar_items_batch(ids)
        after = self._cache_sizes(eng)
        assert after == before, f"retrace after warmup: {before} -> {after}"


class TestImages:
    @pytest.fixture(scope="class")
    def image_engine(self, model_cfg, tmp_path_factory):
        data = make_synthetic(n_items=50, d_embed=32, n_outfits=16, seed=7)
        img_dir = tmp_path_factory.mktemp("images")
        # one-pixel JPEG for the first two catalog items
        import io

        from PIL import Image

        for item_id in data.catalog.item_ids[:2]:
            buf = io.BytesIO()
            Image.new("RGB", (4, 4), (200, 30, 90)).save(buf, format="JPEG")
            (img_dir / f"{int(item_id)}.jpg").write_bytes(buf.getvalue())
        return ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            mock=True,
            images_dir=str(img_dir),
        )

    def test_item_info_has_image_url(self, image_engine):
        info = image_engine._item_info(0, 0.0)
        assert info["image_url"] == f"/images/{info['item_id']}.jpg"
        info_no_img = image_engine._item_info(10, 0.0)
        assert "image_url" not in info_no_img

    def test_http_serves_image_bytes(self, image_engine):
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler

        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(image_engine)
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            item_id = int(image_engine.catalog.item_ids[0])
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/images/{item_id}.jpg"
            ) as r:
                body = r.read()
                assert r.headers["Content-Type"] == "image/jpeg"
                assert body[:2] == b"\xff\xd8"  # JPEG magic
            # unknown id -> 404; traversal attempt -> 400
            for path, code in (
                ("/images/999999.jpg", 404),
                ("/images/..%2fsecret.jpg", 400),
            ):
                try:
                    urllib.request.urlopen(f"http://127.0.0.1:{port}{path}")
                    assert False, "expected HTTPError"
                except urllib.error.HTTPError as e:
                    assert e.code == code
        finally:
            httpd.shutdown()


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
        cpb = self._post(
            server + "/api/cp_batch",
            {"outfits": [outfit, outfit[:2]]},
        )
        assert len(cpb["scores"]) == 2
        cir = self._post(
            server + "/api/cir", {"outfit": outfit[:3], "target": outfit[3]}
        )
        assert len(cir["items"]) == 10
        fitb = self._post(
            server + "/api/fitb",
            {"outfit": outfit[:2], "candidates": engine.sample_outfit(4)},
        )
        assert 0 <= fitb["pick"] < 4

    def test_update_items_roundtrip(self, server, engine):
        import numpy as np

        ids = engine.sample_outfit(2)
        src, dst = ids[0], ids[1]
        new_emb = np.asarray(
            engine.catalog.embeddings[engine.lookup_row(src)]
        ).tolist()
        out = self._post(
            server + "/api/update_items",
            {"item_ids": [dst], "embeddings": [new_emb]},
        )
        assert out["updated"] == 1
        sims = engine.similar_items(src, k=3)
        assert sims[0]["item_id"] == dst

    def test_add_items_without_capacity_gets_400(self, server):
        # the TestHTTP engine reserves no spare capacity -> ValueError,
        # reported as a CLIENT error (400): /api/stats server-error totals
        # must not count deployment-shaped misuse
        req = urllib.request.Request(
            server + "/api/add_items",
            data=json.dumps(
                {"item_ids": [123456789], "embeddings": [[0.0] * 32]}
            ).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
            assert "capacity" in json.loads(e.read())["error"]
        assert raised

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

    def test_malformed_json_gets_400(self, server):
        req = urllib.request.Request(
            server + "/api/cp", data=b"not json", method="POST"
        )
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
        assert raised

    def test_unmatched_routes_collapse_in_stats(self, server):
        for p in ("/wp-admin", "/scan-me-12345"):
            try:
                urllib.request.urlopen(server + p)
            except urllib.error.HTTPError:
                pass
        stats = self._stats_when(
            server, lambda s: "(unmatched)" in s["routes"]
        )
        assert "(unmatched)" in stats["routes"]
        assert "/wp-admin" not in stats["routes"]

    def _stats_when(self, server, cond, tries=40):
        # stats are recorded on the handler thread AFTER the response is
        # written, so poll briefly for the expected row to appear
        import time

        for _ in range(tries):
            with urllib.request.urlopen(server + "/api/stats") as r:
                stats = json.loads(r.read())
            if cond(stats):
                return stats
            time.sleep(0.05)
        return stats

    def test_stats_endpoint(self, server, engine):
        # generate known traffic, then read it back from /api/stats
        self._post(server + "/api/cp", {"outfit": engine.sample_outfit(3)})
        with urllib.request.urlopen(server + "/api/health") as r:
            assert json.loads(r.read())["ok"]
        stats = self._stats_when(
            server,
            lambda s: {"/api/cp", "/api/health"} <= set(s["routes"]),
        )
        assert stats["total_requests"] >= 2
        cp = stats["routes"]["/api/cp"]
        assert cp["n"] >= 1 and cp["p50_ms"] is not None
        assert stats["routes"]["/api/health"]["errors"] == 0
        cat = stats["catalog"]
        assert cat["n_items"] == engine.catalog.n_items
        assert cat["updated_rows"] == engine.n_updated_rows
        # bad requests are accounted as errors (test_bad_request ran a 400
        # against /api/cp in this same class-scoped server, but ordering
        # isn't guaranteed — force one deterministically)
        req = urllib.request.Request(
            server + "/api/cp", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(req)
        except urllib.error.HTTPError:
            pass
        stats2 = self._stats_when(
            server,
            lambda s: s["routes"].get("/api/cp", {}).get("errors", 0) >= 1,
        )
        assert stats2["routes"]["/api/cp"]["errors"] >= 1


class TestConcurrentRequests:
    """ThreadingHTTPServer serves each request on its own thread; jitted
    calls must be safe under that concurrency (JAX dispatch is thread-safe,
    but the engine's host-side assembly must not share mutable state)."""

    def test_parallel_mixed_requests(self, engine):
        import concurrent.futures

        outfits = [engine.sample_outfit(n % 4 + 2) for n in range(16)]
        expected = [engine.cp_score(o) for o in outfits]

        def call(i):
            o = outfits[i]
            if i % 3 == 2:
                return ("sim", len(engine.similar_items(o[0], k=5)))
            return ("cp", engine.cp_score(o))

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(call, range(16)))
        for i, (kind, val) in enumerate(results):
            if kind == "cp":
                assert abs(val - expected[i]) < 1e-5
            else:
                assert val == 5


class TestCoalescingScorer:
    """Dynamic request coalescing (serve/coalesce.py): concurrent cp_score
    calls share one fused cp_score_batch program."""

    def test_concurrent_scores_match_and_coalesce(self, engine, monkeypatch):
        import concurrent.futures

        from outfitx_tpu.serve.coalesce import CoalescingCPScorer

        outfits = [engine.sample_outfit(n % 4 + 2) for n in range(24)]
        expected = [engine.cp_score(o) for o in outfits]
        sizes = []
        real = engine.cp_score_batch
        monkeypatch.setattr(
            engine, "cp_score_batch",
            lambda o: sizes.append(len(o)) or real(o),
        )
        scorer = CoalescingCPScorer(engine, window_ms=25.0)
        try:
            with concurrent.futures.ThreadPoolExecutor(max_workers=12) as ex:
                got = list(ex.map(scorer.score, outfits))
            for g, e in zip(got, expected):
                assert abs(g - e) < 1e-5
            # 24 requests from 12 threads within a 25 ms window must share
            # batches — strictly fewer fused calls than requests.
            assert 1 <= scorer.batch_calls < 24
            # fixed-size submission: every fused call (incl. the warmup)
            # hits the single max_batch bucket -> one compile, ever
            assert set(sizes) == {scorer.max_batch}
        finally:
            scorer.close()

    def test_bad_id_rejected_without_poisoning_batch(self, engine):
        import concurrent.futures

        import pytest as _pytest

        from outfitx_tpu.serve.coalesce import CoalescingCPScorer
        from outfitx_tpu.serve.engine import UnknownItemError

        good = engine.sample_outfit(3)
        scorer = CoalescingCPScorer(engine, window_ms=25.0)
        try:
            with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
                ok = ex.submit(scorer.score, good)
                with _pytest.raises(UnknownItemError):
                    scorer.score([good[0], 10**9])  # unknown id
                assert abs(ok.result() - engine.cp_score(good)) < 1e-5
        finally:
            scorer.close()

    def test_http_cp_route_uses_coalescer(self, engine):
        """make_handler(engine, cp_scorer): /api/cp rides the coalescer;
        every other route is unaffected."""
        import concurrent.futures
        import urllib.request
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler
        from outfitx_tpu.serve.coalesce import CoalescingCPScorer

        scorer = CoalescingCPScorer(engine, window_ms=25.0)
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(engine, scorer)
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            outfits = [engine.sample_outfit(3) for _ in range(8)]

            def post(o):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/api/cp",
                    data=json.dumps({"outfit": o}).encode(),
                    method="POST",
                )
                with urllib.request.urlopen(req) as r:
                    return json.loads(r.read())["score"]

            with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
                got = list(ex.map(post, outfits))
            for g, o in zip(got, outfits):
                assert abs(g - engine.cp_score(o)) < 1e-5
            assert 1 <= scorer.batch_calls < 8
        finally:
            httpd.shutdown()
            scorer.close()

    def test_close_is_idempotent_and_unblocks(self, engine):
        from outfitx_tpu.serve.coalesce import CoalescingCPScorer

        scorer = CoalescingCPScorer(engine, window_ms=1.0)
        assert scorer.score(engine.sample_outfit(2)) >= 0.0
        scorer.close()
        scorer.close()
        with pytest.raises(RuntimeError):
            scorer.score(engine.sample_outfit(2))


class TestSampleBrowsing:
    """Dataset-sample browsing views: sampled test rows rendered with
    ground truth vs prediction (reference demo app.py:121-232)."""

    @pytest.fixture(scope="class")
    def browse_engine(self, model_cfg):
        import jax

        from outfitx_tpu.data.sampler import CandidatePools
        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=9)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        return ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            pools=CandidatePools.build(
                data.catalog, data.cir_valid, pool_size=64, threshold=1, seed=0
            ),
            cp_split=data.cp_valid,
            cir_split=data.cir_valid,
            fitb_split=data.fitb_test,
            warmup=False,
        )

    def test_sample_cp(self, browse_engine):
        samples = browse_engine.sample_cp(3)
        assert len(samples) == 3
        for s in samples:
            assert s["label"] in (0, 1)
            assert 0.0 <= s["prob"] <= 1.0
            assert s["predicted"] == int(s["prob"] > 0.5)
            assert len(s["items"]) >= 1
            assert all("item_id" in it for it in s["items"])

    def test_sample_cir_gt_marking(self, browse_engine):
        samples = browse_engine.sample_cir(3)
        assert len(samples) == 3
        for s in samples:
            assert len(s["retrieved"]) == 10
            gt = s["gt_item"]["item_id"]
            # gt must not be in the partial outfit (it was popped out)
            assert gt not in [i["item_id"] for i in s["partial_outfit"]]
            assert s["gt_in_top10"] == any(
                r["item_id"] == gt for r in s["retrieved"]
            )

    def test_sample_fitb_correct_flag(self, browse_engine):
        samples = browse_engine.sample_fitb(3)
        for s in samples:
            assert len(s["candidates"]) == 4
            assert 0 <= s["answer_index"] < 4
            assert 0 <= s["predicted_index"] < 4
            assert s["correct"] == (s["answer_index"] == s["predicted_index"])

    def test_http_sample_endpoints(self, browse_engine):
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler

        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(browse_engine)
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            for task, key in (
                ("cp", "prob"), ("cir", "gt_item"), ("fitb", "answer_index")
            ):
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/sample_{task}?n=2"
                ) as r:
                    j = json.loads(r.read())
                assert len(j["samples"]) == 2
                assert key in j["samples"][0]
        finally:
            httpd.shutdown()

    def test_sample_views_404_without_splits(self, engine):
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/sample_cp?n=2"
            )
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        finally:
            httpd.shutdown()


class TestBatchedRetrievalSurfaces:
    """cir_top10_batch / similar_items_batch (the coalesced forms of the
    60+ ms requests, VERDICT r3 item 5) must reproduce the single-request
    results in request order, across both routes and bucket boundaries."""

    @pytest.fixture(scope="class")
    def exact_engine(self, model_cfg):
        import jax

        from outfitx_tpu.data.sampler import CandidatePools
        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=11)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        pools = CandidatePools.build(
            data.catalog, data.cir_valid, pool_size=64, threshold=1, seed=0
        )
        # force a MIXED-route batch: drop one category's pool so targets in
        # it take the whole-catalog route
        dropped = sorted(pools.pools)[0]
        del pools.pools[dropped]
        eng = ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            pools=pools,
            approx_topk=False,  # exact top-k: batch == single bitwise-stable
        )
        eng._dropped_cid = dropped
        return eng

    def _requests(self, eng, n):
        rng = __import__("numpy").random.default_rng(3)
        reqs = []
        for _ in range(n):
            ids = eng.sample_outfit(3)
            target = eng.sample_outfit(1)[0]
            reqs.append((ids[:2], target))
        return reqs

    def test_cir_batch_matches_single_mixed_routes(self, exact_engine):
        eng = exact_engine
        # ensure both routes appear: at least one target from the dropped
        # category (catalog route) and one from a pooled category
        import numpy as np

        cat_rows = np.flatnonzero(
            np.asarray(eng.catalog.category_id[: eng.catalog.n_items])
            == eng._dropped_cid
        )
        pool_rows = np.flatnonzero(
            np.asarray(eng.catalog.category_id[: eng.catalog.n_items])
            != eng._dropped_cid
        )
        reqs = self._requests(eng, eng.cp_batch_bucket + 3)
        reqs[0] = (reqs[0][0], int(eng.catalog.item_ids[cat_rows[0]]))
        reqs[1] = (reqs[1][0], int(eng.catalog.item_ids[pool_rows[0]]))
        batch = eng.cir_top10_batch(reqs)
        assert len(batch) == len(reqs)
        for (ids, t), got in zip(reqs, batch):
            single = eng.cir_top10(ids, t)
            assert [x["item_id"] for x in got] == [
                x["item_id"] for x in single
            ]
        assert eng.cir_top10_batch([]) == []

    def test_similar_batch_matches_single(self, exact_engine):
        eng = exact_engine
        ids = eng.sample_outfit(eng.cp_batch_bucket * 2 + 3)
        batch = eng.similar_items_batch(ids)
        assert len(batch) == len(ids)
        for i, got in zip(ids, batch):
            single = eng.similar_items(i)
            assert [x["item_id"] for x in got] == [
                x["item_id"] for x in single
            ]
        assert eng.similar_items_batch([]) == []


class TestMixedTaskCoalescing:
    """CP + CIR + similar coalescers running concurrently must each batch
    their own stream and reproduce single-request results."""

    def test_concurrent_mixed_tasks(self, engine):
        import concurrent.futures

        from outfitx_tpu.serve.coalesce import (
            CoalescingCIRRetriever,
            CoalescingCPScorer,
            CoalescingSimilarItems,
        )

        cp = CoalescingCPScorer(engine, window_ms=20.0)
        cir = CoalescingCIRRetriever(engine, window_ms=20.0)
        sim = CoalescingSimilarItems(engine, window_ms=20.0)
        outfits = [engine.sample_outfit(n % 3 + 2) for n in range(8)]
        targets = [engine.sample_outfit(1)[0] for _ in range(8)]
        items = engine.sample_outfit(8)
        exp_cp = [engine.cp_score(o) for o in outfits]
        exp_cir = [
            [x["item_id"] for x in engine.cir_top10(o, t)]
            for o, t in zip(outfits, targets)
        ]
        exp_sim = [
            [x["item_id"] for x in engine.similar_items(i)] for i in items
        ]
        try:
            with concurrent.futures.ThreadPoolExecutor(max_workers=12) as ex:
                f_cp = [ex.submit(cp.score, o) for o in outfits]
                f_cir = [
                    ex.submit(cir.retrieve, o, t)
                    for o, t in zip(outfits, targets)
                ]
                f_sim = [ex.submit(sim.similar, i) for i in items]
                got_cp = [f.result() for f in f_cp]
                got_cir = [
                    [x["item_id"] for x in f.result()] for f in f_cir
                ]
                got_sim = [
                    [x["item_id"] for x in f.result()] for f in f_sim
                ]
            for g, e in zip(got_cp, exp_cp):
                assert abs(g - e) < 1e-5
            # engine fixture uses approx_topk: allow rank jitter between
            # the B=1 and batched programs' f32 tilings, not id drift
            for g, e in zip(got_cir, exp_cir):
                assert len(set(g) & set(e)) >= 8, (g, e)
            for g, e in zip(got_sim, exp_sim):
                assert len(set(g) & set(e)) >= 8, (g, e)
            assert cir.batch_calls >= 1 and sim.batch_calls >= 1
        finally:
            cp.close()
            cir.close()
            sim.close()

    def test_bad_request_does_not_poison_batch(self, engine):
        from outfitx_tpu.serve.coalesce import CoalescingCIRRetriever
        from outfitx_tpu.serve.engine import UnknownItemError

        cir = CoalescingCIRRetriever(engine, window_ms=5.0)
        try:
            with pytest.raises(UnknownItemError):
                cir.retrieve([10**9], 0)
            good = engine.sample_outfit(3)
            out = cir.retrieve(good[:2], good[2])
            assert len(out) == 10
        finally:
            cir.close()


class TestBucketChunks:
    """engine._bucket_chunks encodes the pad-to-bucket invariant shared by
    cp_score_batch / cir_top10_batch / similar_items_batch."""

    def test_exact_multiple(self):
        from outfitx_tpu.serve.engine import _bucket_chunks

        import numpy as np

        chunks = list(_bucket_chunks(range(8), 4))
        assert [c[0] for c in chunks] == [[0, 1, 2, 3], [4, 5, 6, 7]]
        for sel, padded in chunks:
            assert padded.dtype == np.int64 and list(padded) == sel

    def test_tail_padded_with_first_index(self):
        from outfitx_tpu.serve.engine import _bucket_chunks

        chunks = list(_bucket_chunks([7, 3, 9], 4))
        assert len(chunks) == 1
        sel, padded = chunks[0]
        assert sel == [7, 3, 9]
        assert list(padded) == [7, 3, 9, 7]  # pad repeats the chunk's first

    def test_empty(self):
        from outfitx_tpu.serve.engine import _bucket_chunks

        assert list(_bucket_chunks([], 4)) == []


class TestLiveCatalogUpdates:
    """update_items: in-place embedding refresh without restart or
    recompilation (task programs take the catalog as an argument)."""

    def _engine(self, model_cfg, **kw):
        import jax

        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=21)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        return ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            warmup=False,
            **kw,
        )

    def test_update_moves_neighbours_and_scores(self, model_cfg):
        import numpy as np

        eng = self._engine(model_cfg)
        ids = eng.sample_outfit(3)
        target, clone_src = ids[0], ids[1]
        before = eng.cp_score(ids)
        # make `target` an exact copy of `clone_src`
        src_row = eng.lookup_row(clone_src)
        new_emb = np.array(eng.catalog.embeddings[src_row])
        eng.update_items([target], new_emb[None])
        # device + host rows updated
        np.testing.assert_array_equal(
            eng.catalog.embeddings[eng.lookup_row(target)], new_emb
        )
        np.testing.assert_allclose(
            np.asarray(eng.catalog_dev[eng.lookup_row(target)]),
            new_emb, rtol=1e-6,
        )
        # the clone is now its source's nearest neighbour (d2 = 0)
        sims = eng.similar_items(clone_src, k=3)
        assert sims[0]["item_id"] == target
        assert sims[0]["score"] < 1e-6
        # CP scores see the new embedding (same compiled program)
        after = eng.cp_score(ids)
        assert before != after

    def test_update_unknown_id_raises(self, model_cfg):
        import numpy as np

        eng = self._engine(model_cfg)
        from outfitx_tpu.serve.engine import UnknownItemError

        with pytest.raises(UnknownItemError):
            eng.update_items([10**9], np.zeros((1, 32), np.float32))
        with pytest.raises(ValueError):
            eng.update_items([eng.sample_outfit(1)[0]],
                             np.zeros((1, 7), np.float32))

    def test_update_chunks_and_padding(self, model_cfg):
        import numpy as np

        eng = self._engine(model_cfg)
        eng.update_bucket = 4  # force chunk loop + pad path
        rng = np.random.default_rng(3)
        ids = [int(i) for i in eng.catalog.item_ids[:10]]
        vals = rng.normal(size=(10, 32)).astype(np.float32)
        eng.update_items(ids, vals)
        rows = [eng.lookup_row(i) for i in ids]
        np.testing.assert_allclose(
            np.asarray(eng.catalog_dev)[rows], vals, rtol=1e-6
        )

    def test_quantized_rows_match_full_requantize(self, model_cfg):
        import numpy as np

        from outfitx_tpu.ops.quantization import quantize_catalog

        eng = self._engine(model_cfg, quantized=True, pools=None)
        rng = np.random.default_rng(5)
        ids = [int(i) for i in eng.catalog.item_ids[5:9]]
        vals = rng.normal(size=(4, 32)).astype(np.float32)
        eng.update_items(ids, vals)
        rows = [eng.lookup_row(i) for i in ids]
        # per-row int8 is row-independent: the touched rows must be
        # bit-identical to requantizing the whole updated catalog
        full = quantize_catalog(
            eng.catalog_dev, n_rows=eng.catalog.n_items
        )
        np.testing.assert_array_equal(
            np.asarray(eng._qcat.values)[rows], np.asarray(full.values)[rows]
        )
        np.testing.assert_allclose(
            np.asarray(eng._qcat.scales)[rows],
            np.asarray(full.scales)[rows], rtol=1e-6,
        )

    def test_bf16_catalog_update(self, model_cfg):
        import numpy as np

        eng = self._engine(model_cfg, catalog_dtype="bfloat16")
        ids = [int(eng.catalog.item_ids[0])]
        vals = np.full((1, 32), 0.5, np.float32)
        eng.update_items(ids, vals)
        assert str(eng.catalog_dev.dtype) == "bfloat16"
        np.testing.assert_allclose(
            np.asarray(eng.catalog_dev[0]).astype(np.float32), vals[0]
        )

    def test_update_on_mesh(self, model_cfg):
        import numpy as np

        from outfitx_tpu.core.mesh import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec(data=8, model=1))
        eng = self._engine(model_cfg, mesh=mesh, quantized=True, pools=None)
        rng = np.random.default_rng(9)
        ids = [int(i) for i in eng.catalog.item_ids[40:44]]
        vals = rng.normal(size=(4, 32)).astype(np.float32)
        eng.update_items(ids, vals)
        rows = [eng.lookup_row(i) for i in ids]
        np.testing.assert_allclose(
            np.asarray(eng.catalog_dev)[rows], vals, rtol=1e-6
        )
        # catalog stays row-sharded after the donated scatter
        assert len(eng.catalog_dev.sharding.device_set) == 8
        # retrieval sees the update: clone row 40's embedding onto 41
        eng.update_items(
            [int(eng.catalog.item_ids[41])],
            np.asarray(eng.catalog.embeddings[rows[0]])[None],
        )
        sims = eng.similar_items(int(eng.catalog.item_ids[rows[0]]), k=3)
        assert sims[0]["item_id"] == int(eng.catalog.item_ids[41])


class TestCatalogAppend:
    """add_items: append new items into reserved sentinel rows at runtime
    — no shape change, no re-trace; retrieval sweeps the full capacity."""

    def _engine(self, model_cfg, **kw):
        import jax

        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=200, d_embed=32, n_outfits=64, seed=31)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        return ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            warmup=False,
            spare_capacity=16,
            **kw,
        )

    def test_sentinels_never_retrieved_then_append_found(self, model_cfg):
        import numpy as np

        eng = self._engine(model_cfg)
        assert eng.catalog.capacity == 216 and eng.catalog.n_items == 200
        # pre-append: retrieval sweeps all 216 rows; every hit must be a
        # REAL item (a sentinel row index would fail the item_ids lookup)
        src = int(eng.catalog.item_ids[7])
        sims = eng.similar_items(src, k=10)
        assert len(sims) == 10
        assert all(s["item_id"] in eng.catalog.id_to_row for s in sims)
        # append a clone of src -> it must become src's nearest neighbour
        new_id = 999_001
        emb = np.asarray(eng.catalog.embeddings[eng.lookup_row(src)])
        eng.add_items(
            [new_id], emb[None],
            category_ids=[int(eng.catalog.category_id[eng.lookup_row(src)])],
            descriptions=["appended clone"],
        )
        assert eng.catalog.n_items == 201
        sims = eng.similar_items(src, k=3)
        assert sims[0]["item_id"] == new_id
        assert sims[0]["description"] == "appended clone"
        # appended items work inside outfits (forward gathers their rows)
        s = eng.cp_score([src, new_id] + eng.sample_outfit(2))
        assert 0.0 <= s <= 1.0
        # and as CIR targets (no pool for the category -> whole catalog)
        items = eng.cir_top10(eng.sample_outfit(3), new_id)
        assert len(items) == 10

    def test_capacity_and_duplicate_errors(self, model_cfg):
        import numpy as np

        eng = self._engine(model_cfg)
        with pytest.raises(ValueError, match="capacity"):
            eng.add_items(
                list(range(1_000_000, 1_000_017)),
                np.zeros((17, 32), np.float32),
            )
        existing = int(eng.catalog.item_ids[0])
        with pytest.raises(ValueError, match="already"):
            eng.add_items([existing], np.zeros((1, 32), np.float32))

    def test_quantized_append_matches_full_requantize(self, model_cfg):
        import numpy as np

        from outfitx_tpu.ops.quantization import quantize_catalog

        eng = self._engine(model_cfg, quantized=True, pools=None)
        rng = np.random.default_rng(13)
        vals = rng.normal(size=(3, 32)).astype(np.float32)
        eng.add_items([777_001, 777_002, 777_003], vals)
        rows = [eng.lookup_row(i) for i in (777_001, 777_002, 777_003)]
        full = quantize_catalog(eng.catalog_dev, n_rows=eng.catalog.pad_row)
        np.testing.assert_array_equal(
            np.asarray(eng._qcat.values)[rows],
            np.asarray(full.values)[rows],
        )
        # the new rows retrieve through the int8 route
        sims = eng.similar_items(777_001, k=3)
        assert all(s["item_id"] in eng.catalog.id_to_row for s in sims)

    def test_split_pad_rows_remapped(self, model_cfg):
        """Splits built against the UNGROWN catalog must keep working:
        their padded slots are remapped from the old PAD index (now a
        sentinel row) to the new one (zeros)."""
        import jax

        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=200, d_embed=32, n_outfits=64, seed=31)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        eng = ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            warmup=False,
            spare_capacity=8,
            cp_split=data.cp_valid,
            fitb_split=data.fitb_test,
        )
        pad = eng.catalog.pad_row
        assert (eng.cp_split.item_rows <= pad).all()
        assert not (
            (eng.cp_split.item_rows >= eng.catalog.n_items)
            & (eng.cp_split.item_rows < pad)
        ).any()  # nothing points at a sentinel row
        rows = eng.sample_cp(n=2)
        assert len(rows) == 2 and all(0 <= r["prob"] <= 1 for r in rows)
        picks = eng.sample_fitb(n=2)
        assert len(picks) == 2

    def test_append_on_mesh(self, model_cfg):
        import numpy as np

        from outfitx_tpu.core.mesh import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec(data=8, model=1))
        eng = self._engine(model_cfg, mesh=mesh)
        src = int(eng.catalog.item_ids[3])
        emb = np.asarray(eng.catalog.embeddings[eng.lookup_row(src)])
        eng.add_items([888_001], emb[None])
        sims = eng.similar_items(src, k=3)
        assert sims[0]["item_id"] == 888_001
        assert len(eng.catalog_dev.sharding.device_set) == 8


class TestReviewHardening:
    """Round-4 code-review findings: fitb candidate bucketing, sentinel
    filtering at tiny catalogs, duplicate-id update dedup, client-garbage
    status codes, stats route-cardinality bound."""

    def _mk(self, model_cfg, n_items=300, synth=None, **kw):
        import jax

        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(
            **{
                "n_items": n_items, "d_embed": 32, "n_outfits": 32,
                "seed": 9, **(synth or {}),
            }
        )
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        return ServingEngine(
            **{
                "model_cfg": model_cfg, "catalog": data.catalog,
                "cp_params": params, "cir_params": params,
                "warmup": False, **kw,
            }
        )

    def test_fitb_any_candidate_count_buckets(self, model_cfg):
        eng = self._mk(model_cfg)
        ids = eng.sample_outfit(8)
        outfit, cands5 = ids[:3], ids[3:8]
        pick5 = eng.fitb_pick(outfit, cands5)
        assert 0 <= pick5 < 5
        # manual pad to the bucket with candidate 0 == same program, and
        # the winner must be the same real slot
        pick8 = eng.fitb_pick(outfit, cands5 + [cands5[0]] * 3)
        assert pick8 == pick5
        # the engine compiled one program for C in {5..8}: only buckets
        # 4 and 8 exist as trace shapes
        pick6 = eng.fitb_pick(outfit, cands5 + [cands5[1]])
        assert 0 <= pick6 < 6

    def test_tiny_catalog_with_spares_returns_only_real_items(
        self, model_cfg
    ):
        eng = self._mk(
            model_cfg, n_items=9, spare_capacity=64,
            synth={"n_styles": 1, "outfit_len": (2, 3), "n_outfits": 8},
        )
        ids = [int(i) for i in eng.catalog.item_ids[:4]]
        sims = eng.similar_items(ids[0], k=10)  # k+1 > n_items
        assert 0 < len(sims) <= 8  # real neighbours only, query excluded
        assert all(
            s["item_id"] in set(int(i) for i in eng.catalog.item_ids[:9])
            for s in sims
        )
        top = eng.cir_top10(ids[:2], ids[2])
        assert 0 < len(top) <= 9
        batch = eng.cir_top10_batch([(ids[:2], ids[2])])[0]
        assert [t["item_id"] for t in batch] == [t["item_id"] for t in top]

    def test_duplicate_update_ids_last_wins_on_device(self, model_cfg):
        import numpy as np

        eng = self._mk(model_cfg, quantized=True)
        a = int(eng.catalog.item_ids[0])
        row = eng.lookup_row(a)
        rng = np.random.default_rng(3)
        v1 = rng.normal(size=(32,)).astype(np.float32)
        v2 = rng.normal(size=(32,)).astype(np.float32)
        eng.update_items([a, a], np.stack([v1, v2]))
        np.testing.assert_array_equal(eng.catalog.embeddings[row], v2)
        dev = np.asarray(eng.catalog_dev)[row]
        np.testing.assert_allclose(dev, v2, rtol=0, atol=0)

    def test_scatter_warmup_is_bit_exact(self, model_cfg):
        import numpy as np

        cold = self._mk(model_cfg, quantized=True, warmup=False)
        warm = self._mk(model_cfg, quantized=True, warmup=True)
        np.testing.assert_array_equal(
            np.asarray(cold.catalog_dev), np.asarray(warm.catalog_dev)
        )
        np.testing.assert_array_equal(
            np.asarray(cold._qcat.values), np.asarray(warm._qcat.values)
        )


class TestConcurrentUpdates:
    """Requests racing live updates: the donated old buffer makes a stale
    ref raise 'deleted' at dispatch — `_run` retries with fresh refs, so
    no request may ever fail or read garbage."""

    def test_requests_survive_update_storm(self, model_cfg):
        import concurrent.futures

        import jax
        import numpy as np

        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=200, d_embed=32, n_outfits=64, seed=41)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        eng = ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            warmup=False,
            quantized=True,
            pools=None,
            spare_capacity=64,
        )
        rng = np.random.default_rng(0)
        ids = [int(i) for i in eng.catalog.item_ids[:8]]

        def updater(i):
            if i % 3 == 0:
                eng.add_items(
                    [500_000 + i], rng.normal(size=(1, 32)).astype(np.float32)
                )
            else:
                eng.update_items(
                    [ids[i % 8]],
                    rng.normal(size=(1, 32)).astype(np.float32),
                )
            return "u"

        def requester(i):
            if i % 2:
                return eng.cp_score(ids[: 2 + i % 4])
            return eng.similar_items(ids[i % 8], k=5)

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            futs = [
                ex.submit(updater if i % 4 == 0 else requester, i)
                for i in range(48)
            ]
            results = [f.result() for f in futs]  # raises on any failure
        assert len(results) == 48
        # all appends landed
        assert eng.catalog.n_items == 200 + len(
            [i for i in range(48) if i % 4 == 0 and i % 3 == 0]
        )


class TestMeshShardedEngine:
    """ServingEngine(mesh=...) row-shards the catalog over the data axis
    and serves whole-catalog retrieval via per-shard top-k + merge
    (ops/retrieval_sharded.py). Results must match the single-device
    engine exactly (same dtype, exact merge)."""

    @pytest.fixture(scope="class")
    def engines(self, model_cfg):
        import jax

        from outfitx_tpu.core.mesh import MeshSpec, make_mesh
        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=7)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        mesh = make_mesh(MeshSpec(data=8, model=1))
        mk = lambda **kw: ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            **kw,
        )
        return mk(), mk(mesh=mesh), mk(mesh=mesh, quantized=True)

    def test_catalog_is_row_sharded_and_padded(self, engines):
        _, sharded, quant = engines
        # 301 rows (300 + PAD) pad to 304 = 8 x 38
        assert sharded.catalog_dev.shape[0] == 304
        assert len(sharded.catalog_dev.sharding.device_set) == 8
        assert quant._qcat.values.shape[0] == 304
        assert len(quant._qcat.values.sharding.device_set) == 8

    def test_cp_scores_match(self, engines):
        import numpy as np

        plain, sharded, _ = engines
        outfits = [plain.sample_outfit(n) for n in (2, 4, 3)]
        a = np.asarray([plain.cp_score(o) for o in outfits])
        b = np.asarray([sharded.cp_score(o) for o in outfits])
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_whole_catalog_retrieval_matches(self, engines):
        plain, sharded, quant = engines
        outfit = plain.sample_outfit(3)
        target = plain.sample_outfit(1)[0]
        a = [it["item_id"] for it in plain.cir_top10(outfit, target)]
        b = [it["item_id"] for it in sharded.cir_top10(outfit, target)]
        assert a == b
        sa = [it["item_id"] for it in plain.similar_items(outfit[0], k=10)]
        sb = [it["item_id"] for it in sharded.similar_items(outfit[0], k=10)]
        assert a == b and sa == sb
        # int8 + sharded compose; quantization noise may reorder near-ties
        sq = {it["item_id"] for it in quant.similar_items(outfit[0], k=10)}
        assert len(set(sa) & sq) >= 8

    def test_quantized_model_on_mesh(self, model_cfg):
        """quantize_model (int8 W8A8 forward) composes with the
        mesh-sharded catalog: q8 params are replicated, scores track the
        single-device f32 engine."""
        import jax

        from outfitx_tpu.core.mesh import MeshSpec, make_mesh
        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=7)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        mesh = make_mesh(MeshSpec(data=8, model=1))
        mk = lambda **kw: ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            warmup=False,
            **kw,
        )
        plain = mk()
        q8_mesh = mk(mesh=mesh, quantize_model=True)
        outfit = plain.sample_outfit(4)
        assert abs(plain.cp_score(outfit) - q8_mesh.cp_score(outfit)) < 0.05
        target = plain.sample_outfit(1)[0]
        a = {it["item_id"] for it in plain.cir_top10(outfit, target)}
        b = {it["item_id"] for it in q8_mesh.cir_top10(outfit, target)}
        assert len(a & b) >= 7

    def test_batched_surfaces_match(self, engines):
        import numpy as np

        plain, sharded, _ = engines
        outfits = [plain.sample_outfit(n) for n in (2, 3, 4, 2, 5)]
        np.testing.assert_allclose(
            np.asarray(plain.cp_score_batch(outfits)),
            np.asarray(sharded.cp_score_batch(outfits)),
            atol=1e-5,
        )
        target = plain.sample_outfit(1)[0]
        a = plain.cir_top10_batch([(o, target) for o in outfits[:2]])
        b = sharded.cir_top10_batch([(o, target) for o in outfits[:2]])
        assert [[i["item_id"] for i in r] for r in a] == [
            [i["item_id"] for i in r] for r in b
        ]


class TestBf16Catalog:
    """catalog_dtype='bfloat16' halves catalog HBM + H2D staging; compute
    is bf16 regardless, so scores must match the f32-catalog engine within
    bf16 storage rounding and retrieval must return (near-)identical sets."""

    @pytest.fixture(scope="class")
    def engines(self, model_cfg):
        import jax

        from outfitx_tpu.models import OutfitXModel

        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=5)
        params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
        mk = lambda dt: ServingEngine(
            model_cfg=model_cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            catalog_dtype=dt,
        )
        return mk("float32"), mk("bfloat16")

    def test_catalog_dtype_and_bytes(self, engines):
        import jax.numpy as jnp

        f32, bf16 = engines
        assert bf16.catalog_dev.dtype == jnp.bfloat16
        assert bf16.catalog_dev.nbytes * 2 == f32.catalog_dev.nbytes

    def test_cp_scores_close(self, engines):
        import numpy as np

        f32, bf16 = engines
        outfits = [f32.sample_outfit(n) for n in (2, 4, 3, 5)]
        a = np.asarray([f32.cp_score(o) for o in outfits])
        b = np.asarray([bf16.cp_score(o) for o in outfits])
        np.testing.assert_allclose(a, b, atol=2e-2)

    def test_retrieval_sets_overlap(self, engines):
        f32, bf16 = engines
        outfit = f32.sample_outfit(3)
        target = f32.sample_outfit(1)[0]
        a = {it["item_id"] for it in f32.cir_top10(outfit, target)}
        b = {it["item_id"] for it in bf16.cir_top10(outfit, target)}
        assert len(a & b) >= 8  # bf16 rounding may reorder near-ties
        sa = {it["item_id"] for it in f32.similar_items(outfit[0], k=10)}
        sb = {it["item_id"] for it in bf16.similar_items(outfit[0], k=10)}
        assert len(sa & sb) >= 8


class TestReplicaRecycling:
    """The --max-rss-gb/--max-age self-drain hook (serve/app.py
    start_drain_watchdog): the watchdog stops the accept loop, in-flight
    requests complete, and the process exits DRAIN_EXIT_CODE so a
    supervisor restarts the replica warm."""

    def test_stats_expose_recycling_signals(self, engine):
        from outfitx_tpu.serve.stats import ServerStats, host_rss_mb

        snap = ServerStats().snapshot(engine)
        assert snap["host_rss_mb"] > 10.0  # a real python process
        assert snap["uptime_s"] >= 0.0
        assert host_rss_mb() == pytest.approx(snap["host_rss_mb"], rel=0.5)

    def test_age_drain_fires_and_requests_complete(self, engine):
        import time
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler, start_drain_watchdog

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        port = httpd.server_address[1]
        fired = start_drain_watchdog(httpd, max_age_s=1.0, interval_s=0.1)
        assert httpd.daemon_threads is False  # drain joins in-flight
        t = threading.Thread(target=httpd.serve_forever)
        t.start()
        # traffic before the drain must succeed
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/health", timeout=5
        ) as r:
            assert json.loads(r.read())["ok"]
        t.join(timeout=30)
        assert not t.is_alive(), "drain watchdog never stopped the server"
        assert "age" in fired["reason"]
        httpd.server_close()
        # post-drain: connections are refused (supervisor's restart signal)
        with pytest.raises(OSError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/health", timeout=2
            )

    def test_rss_drain_threshold(self, engine):
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler, start_drain_watchdog
        from outfitx_tpu.serve.stats import host_rss_mb

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        # limit set below current RSS -> fires on the first check
        fired = start_drain_watchdog(
            httpd, max_rss_mb=max(1.0, host_rss_mb() / 2), interval_s=0.05
        )
        t = threading.Thread(target=httpd.serve_forever)
        t.start()
        t.join(timeout=30)
        assert not t.is_alive()
        assert "RSS" in fired["reason"]
        httpd.server_close()


    def test_in_flight_request_completes_during_drain(self, engine):
        """The drain contract's core promise: a request already being
        handled when the watchdog fires runs to completion (the watchdog
        only stops the ACCEPT loop; server_close joins handler threads)."""
        import time
        from http.server import ThreadingHTTPServer

        from outfitx_tpu.serve.app import make_handler, start_drain_watchdog

        slow_started = threading.Event()
        orig = engine.cp_score

        def slow_cp_score(ids):
            slow_started.set()
            time.sleep(2.0)  # hold the request across the drain moment
            return orig(ids)

        engine.cp_score = slow_cp_score
        try:
            httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
            port = httpd.server_address[1]
            t = threading.Thread(target=httpd.serve_forever)
            t.start()

            result = {}

            def client():
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/api/cp",
                    data=json.dumps(
                        {"outfit": engine.sample_outfit(3)}
                    ).encode(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=30) as r:
                    result["status"] = r.status
                    result["body"] = json.loads(r.read())

            ct = threading.Thread(target=client)
            ct.start()
            assert slow_started.wait(timeout=10)
            # request is now mid-handler: fire the drain
            fired = start_drain_watchdog(httpd, max_age_s=0.0, interval_s=0.05)
            t.join(timeout=30)
            assert not t.is_alive()
            httpd.server_close()  # joins the in-flight handler thread
            ct.join(timeout=30)
            assert result.get("status") == 200, result
            assert "score" in result["body"]
            assert fired["reason"]
        finally:
            engine.cp_score = orig
