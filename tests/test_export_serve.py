"""Export + serving tests: StableHLO round-trip parity (the analogue of the
reference's ONNX parity suite, ``tests/test_onnx.py``) and the batching
HTTP server end-to-end."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax.numpy as jnp

from gigaam_tpu.export import export_model, load_exported
from gigaam_tpu.frontend import LogMelFrontend
from gigaam_tpu.models.model import GigaAMASR
from gigaam_tpu.serve import BatchingASRServer, make_handler

from test_training import tiny_cfg


@pytest.fixture(scope="module")
def ctc_model():
    return GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def rnnt_model():
    return GigaAMASR(tiny_cfg("rnnt"), seed=0, compute_dtype=jnp.float32)


def test_export_ctc_roundtrip(tmp_path, ctc_model):
    out = str(tmp_path / "export")
    manifest = export_model(ctc_model, out, batch_sizes=(2,),
                            audio_seconds=(1,))
    assert "ctc" in manifest["graphs"]

    cfg, graphs = load_exported(out)
    assert cfg.model_name == ctc_model.cfg.model_name
    g = graphs["ctc"][0]

    # parity vs the live model (reference test_onnx.py contract)
    rng = np.random.default_rng(0)
    wavs = [(0.1 * rng.standard_normal(16000)).astype(np.float32),
            (0.1 * rng.standard_normal(12000)).astype(np.float32)]
    fe = LogMelFrontend(cfg.preprocessor)
    batch = np.zeros((2, 16000), np.float32)
    batch[0], batch[1, :12000] = wavs[0], wavs[1]
    feats, feat_lens = fe(jnp.asarray(batch), jnp.asarray([16000, 12000]))
    feats = jnp.transpose(feats, (0, 2, 1))

    log_probs, enc_lens = g(np.asarray(feats), np.asarray(feat_lens))

    pos = ctc_model._pos_for(16000)
    enc_live, lens_live = ctc_model._encode_jit(
        ctc_model.params, jnp.asarray(batch), jnp.asarray([16000, 12000]), pos)
    from gigaam_tpu.models.heads import ctc_log_probs

    lp_live = ctc_log_probs(ctc_model.params["head"], enc_live)
    np.testing.assert_array_equal(np.asarray(enc_lens), np.asarray(lens_live))
    np.testing.assert_allclose(np.asarray(log_probs), np.asarray(lp_live),
                               atol=1e-4)


def test_export_rnnt_parts(tmp_path, rnnt_model):
    out = str(tmp_path / "export_rnnt")
    manifest = export_model(rnnt_model, out, batch_sizes=(1,),
                            audio_seconds=(1,))
    assert set(manifest["graphs"]) >= {"encoder", "decoder", "joint"}

    _, graphs = load_exported(out)
    dec = graphs["decoder"][0]
    jnt = graphs["joint"][0]

    from gigaam_tpu.models.heads import rnnt_joint_step, rnnt_predict_step

    h0 = np.zeros((1, 1, 16), np.float32)
    labels = np.array([3], np.int32)
    pred, h1, c1 = dec(labels, h0, h0)
    pred_ref, h_ref, c_ref = rnnt_predict_step(
        rnnt_model.params["head"], jnp.asarray(labels), jnp.asarray(h0),
        jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h_ref), atol=1e-5)

    enc_t = np.random.default_rng(1).standard_normal((1, 32)).astype(np.float32)
    lp = jnt(enc_t, np.asarray(pred))
    lp_ref = rnnt_joint_step(rnnt_model.params["head"], jnp.asarray(enc_t),
                             jnp.asarray(pred_ref))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref), atol=1e-5)


@pytest.fixture(scope="module")
def http_server(ctc_model):
    server = BatchingASRServer(ctc_model, max_batch=4, batch_window_ms=5.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()
    server.shutdown()


def _post_json(url, payload, query=""):
    req = urllib.request.Request(
        url + "/transcribe" + query,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_health_and_transcribe(http_server):
    with urllib.request.urlopen(http_server + "/health", timeout=10) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"

    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(16000)).tolist()
    status, out = _post_json(http_server, {"audio": wav})
    assert status == 200 and "text" in out

    status, out = _post_json(http_server, {"audio": wav}, "?timestamps=1")
    assert status == 200 and "words" in out


def test_server_concurrent_batching(http_server):
    rng = np.random.default_rng(1)
    results = [None] * 4

    def worker(i):
        wav = (0.1 * rng.standard_normal(16000)).tolist()
        results[i] = _post_json(http_server, {"audio": wav})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r[0] == 200 for r in results)


def test_server_pads_rows_to_max_batch(ctc_model):
    """Every decode call must use exactly max_batch rows so serving
    compiles one graph per duration bucket, not one per batch size."""
    server = BatchingASRServer(ctc_model, max_batch=4, batch_window_ms=5.0)
    try:
        seen = []
        orig = ctc_model._decode_batch_submit

        def spy(wavs, *a, **kw):
            seen.append(kw.get("pad_rows_to", 0))
            return orig(wavs, *a, **kw)

        ctc_model._decode_batch_submit = spy
        wav = (0.1 * np.random.default_rng(4)
               .standard_normal(8000)).astype(np.float32)
        req = server.submit(wav, timestamps=False)
        assert req.error is None and req.result["text"] is not None
        assert seen and all(n == 4 for n in seen), seen
    finally:
        ctc_model._decode_batch_submit = orig
        server.shutdown()


def test_server_error_paths(http_server):
    status, out = _post_json(http_server, {"audio": []})
    assert status == 400 and "empty" in out["error"]
    status, out = _post_json(http_server,
                             {"audio": [0.0] * (26 * 16000)})
    assert status == 400 and "longform" in out["error"]
    status, out = _post_json(http_server, {"wrong_key": 1})
    assert status == 400


def test_server_longform_endpoint(http_server):
    """>25 s audio transcribes via /transcribe_longform with segments."""
    rng = np.random.default_rng(5)
    sr = 16000
    pieces = []
    for _ in range(3):
        t = np.arange(sr * 9) / sr
        pieces.append((0.3 * np.sin(2 * np.pi * 300 * t)
                       + 0.02 * rng.standard_normal(sr * 9)))
        pieces.append(np.zeros(sr))
    wav = np.concatenate(pieces).astype(np.float32)
    req = urllib.request.Request(
        http_server + "/transcribe_longform",
        data=json.dumps({"audio": wav.tolist()}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert "text" in out and isinstance(out["segments"], list)
    assert out["segments"], "expected at least one VAD segment"
    for seg in out["segments"]:
        assert seg["start"] < seg["end"]


def test_server_overload_returns_503(ctc_model):
    """A full queue answers 'overloaded' (503 over HTTP) immediately."""
    server = BatchingASRServer(ctc_model, max_batch=2, batch_window_ms=5.0,
                               max_queue=1)
    try:
        # freeze the batch loop, then stuff the queue so submit() sees it full
        server._stop.set()
        server._thread.join(timeout=2)
        import numpy as _np
        from gigaam_tpu.serve import _Request

        server.q.put_nowait(_Request(_np.zeros(1000, _np.float32), False))
        wav = (0.1 * np.random.default_rng(6)
               .standard_normal(4000)).astype(np.float32)
        req = server.submit(wav, timestamps=False, timeout=1.0)
        assert req.error == "overloaded"
    finally:
        server.shutdown()


# -- artifact-only inference (reference infer_onnx analogue) ----------------


@pytest.mark.parametrize("kind", ["ctc", "rnnt"])
def test_infer_exported_matches_live(tmp_path, kind, ctc_model, rnnt_model):
    """Transcripts produced from the serialized artifacts alone must equal
    the live model's (reference ``tests/test_onnx.py`` exact-equality
    contract)."""
    from gigaam_tpu.exported_infer import infer_exported

    model = ctc_model if kind == "ctc" else rnnt_model
    out = str(tmp_path / f"export_{kind}")
    export_model(model, out, batch_sizes=(4,), audio_seconds=(1,))

    rng = np.random.default_rng(2)
    wavs = [(0.1 * rng.standard_normal(16000 - 1000 * i)).astype(np.float32)
            for i in range(3)]
    live = [t for t, _ in model._decode_batch(wavs, word_timestamps=False)]
    got = infer_exported(out, wavs, batch_size=4)["hypotheses"]
    assert got == live


def test_infer_exported_emo_and_ssl(tmp_path):
    """Emo probs and SSL embeddings from artifacts alone must match the
    live models (reference ``tests/test_onnx.py`` emo/ssl branches)."""
    from gigaam_tpu.config import (EmoHeadConfig, FeaturesConfig,
                                   ModelConfig)
    from gigaam_tpu.exported_infer import infer_exported
    from gigaam_tpu.models.model import GigaAM, GigaAMEmo

    from test_model_api import tiny_encoder

    rng = np.random.default_rng(5)
    wavs = [(0.1 * rng.standard_normal(16000 - 2000 * i)).astype(np.float32)
            for i in range(2)]

    emo_cfg = ModelConfig(
        model_name="tiny_emo", model_class="emo",
        preprocessor=FeaturesConfig(), encoder=tiny_encoder(),
        head=EmoHeadConfig(feat_in=64, num_classes=4),
        id2name=["angry", "sad", "neutral", "positive"])
    emo = GigaAMEmo(emo_cfg, seed=0, compute_dtype=jnp.float32)
    out = str(tmp_path / "export_emo")
    manifest = export_model(emo, out, batch_sizes=(2,), audio_seconds=(1,))
    assert "probs" in manifest["graphs"]
    got = infer_exported(out, wavs, batch_size=2)["hypotheses"]
    from gigaam_tpu.models.model import pad_wav_batch
    for i, w in enumerate(wavs):
        batch, lens = pad_wav_batch([w])
        pos = emo._pos_for(batch.shape[1])
        live = np.asarray(emo._probs_jit(
            emo.params, jnp.asarray(batch), jnp.asarray(lens), pos))[0]
        np.testing.assert_allclose(got[i], live, atol=1e-4)
        np.testing.assert_allclose(got[i].sum(), 1.0, atol=1e-5)

    ssl_cfg = ModelConfig(model_name="tiny_ssl", model_class="ssl",
                          preprocessor=FeaturesConfig(),
                          encoder=tiny_encoder())
    ssl = GigaAM(ssl_cfg, seed=0, compute_dtype=jnp.float32)
    out2 = str(tmp_path / "export_ssl")
    export_model(ssl, out2, batch_sizes=(2,), audio_seconds=(1,))
    embeds = infer_exported(out2, wavs, batch_size=2)["hypotheses"]
    for i, w in enumerate(wavs):
        enc_live, len_live = ssl.encode_batch([w])
        tl = int(len_live[0])
        assert embeds[i].ndim == 2
        np.testing.assert_allclose(embeds[i][:tl],
                                   np.asarray(enc_live)[0, :tl], atol=1e-4)


def test_infer_exported_wer_and_buckets(tmp_path, ctc_model):
    from gigaam_tpu.exported_infer import infer_exported

    out = str(tmp_path / "export_wer")
    export_model(ctc_model, out, batch_sizes=(2,), audio_seconds=(1,))
    rng = np.random.default_rng(3)
    wavs = [(0.1 * rng.standard_normal(8000)).astype(np.float32)
            for _ in range(2)]
    hyps = infer_exported(out, wavs)["hypotheses"]
    res = infer_exported(out, wavs, refs=hyps)
    assert res["wer_e2e"] == 0.0

    # a batch_size above the largest exported row bucket clamps (with a
    # warning) and still transcribes every item — no silent truncation
    with pytest.warns(UserWarning, match="largest"):
        res4 = infer_exported(out, wavs * 2, batch_size=4)
    assert res4["hypotheses"] == hyps * 2

    # audio longer than any exported duration bucket must still fail loudly
    long_wav = (0.1 * rng.standard_normal(3 * 16000)).astype(np.float32)
    with pytest.raises(ValueError):
        infer_exported(out, [long_wav], batch_size=2)


# -- HTTP client (reference run_client.py analogue) --------------------------


def test_client_transcribe_files(tmp_path, http_server):
    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.client import health, transcribe_files

    assert health(http_server)["status"] == "ok"

    rng = np.random.default_rng(4)
    files = []
    for i in range(3):
        p = str(tmp_path / f"utt{i}.wav")
        save_wav(p, (0.1 * rng.standard_normal(16000)).astype(np.float32))
        files.append(p)

    results = transcribe_files(http_server, files, concurrency=3)
    assert len(results) == 3 and all("text" in r for r in results)

    with_ts = transcribe_files(http_server, files[:1], timestamps=True)
    assert "words" in with_ts[0]


def test_server_beam_size(rnnt_model, tmp_path):
    """A beam-configured server serves transcriptions end-to-end."""
    from gigaam_tpu.audio import save_wav

    srv = BatchingASRServer(rnnt_model, max_batch=2, batch_window_ms=5.0,
                            beam_size=4)
    try:
        wav = (0.1 * np.random.default_rng(0)
               .standard_normal(16000)).astype(np.float32)
        req = srv.submit(wav, timestamps=True)
        assert req.error is None and "text" in req.result
    finally:
        srv.shutdown()


def _write_tiny_sp_model(path, pieces):
    """Minimal SentencePiece ModelProto: repeated field 1 of
    {piece:1 str, score:2 float, type:3 enum}."""
    import struct

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    blob = b""
    for piece, score, ptype in pieces:
        pb = piece.encode("utf-8")
        msg = (bytes([0x0A]) + varint(len(pb)) + pb        # field 1, wire 2
               + bytes([0x15]) + struct.pack("<f", score)  # field 2, wire 5
               + bytes([0x18]) + varint(ptype))            # field 3, wire 0
        blob += bytes([0x0A]) + varint(len(msg)) + msg
    with open(path, "wb") as f:
        f.write(blob)


def test_exported_artifact_bundles_sp_tokenizer(tmp_path):
    """SP-tokenizer models must export a relocatable artifact dir: the
    .model file is bundled and the stored path is relative (an absolute
    path into the exporting machine's cache breaks other hosts)."""
    import shutil

    from gigaam_tpu.config import (CTCHeadConfig, DecodingConfig,
                                   FeaturesConfig, ModelConfig)
    from gigaam_tpu.exported_infer import infer_exported
    from gigaam_tpu.models.model import GigaAMASR

    from test_model_api import tiny_encoder

    sp_path = str(tmp_path / "tok.model")
    pieces = ([("<unk>", 0.0, 2)]
              + [(c, -1.0, 1) for c in "абвгде"]
              + [("▁пр", -0.5, 1)])
    _write_tiny_sp_model(sp_path, pieces)

    v = len(pieces)
    cfg = ModelConfig(
        model_name="tiny_sp_ctc", model_class="asr",
        preprocessor=FeaturesConfig(), encoder=tiny_encoder(),
        head=CTCHeadConfig(feat_in=64, num_classes=v + 1),
        decoding=DecodingConfig(kind="ctc_greedy", vocabulary=[],
                                model_path=sp_path))
    model = GigaAMASR(cfg, seed=0, compute_dtype=jnp.float32)

    out = str(tmp_path / "artifact")
    export_model(model, out, batch_sizes=(2,), audio_seconds=(1,))
    assert (tmp_path / "artifact" / "tokenizer.model").exists()

    # relocate the artifact AND remove the original tokenizer file: the
    # moved dir must still decode
    moved = str(tmp_path / "moved_artifact")
    shutil.move(out, moved)
    import os
    os.remove(sp_path)

    rng = np.random.default_rng(8)
    wavs = [(0.1 * rng.standard_normal(12000)).astype(np.float32)]
    hyps = infer_exported(moved, wavs)["hypotheses"]
    assert len(hyps) == 1 and isinstance(hyps[0], str)


def test_client_routes_longform_files(tmp_path, http_server):
    """transcribe_files sends >25 s files to the longform endpoint."""
    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.client import transcribe_files

    rng = np.random.default_rng(7)
    sr = 16000
    short = str(tmp_path / "short.wav")
    save_wav(short, (0.1 * rng.standard_normal(sr)).astype(np.float32))
    t = np.arange(sr * 9) / sr
    burst = (0.3 * np.sin(2 * np.pi * 280 * t)).astype(np.float32)
    long_wav = np.concatenate(
        [burst, np.zeros(sr, np.float32)] * 3).astype(np.float32)
    long_p = str(tmp_path / "long.wav")
    save_wav(long_p, long_wav)

    out = transcribe_files(http_server, [short, long_p])
    assert "text" in out[0] and "segments" not in out[0]
    assert "segments" in out[1]


# -- serving bucket coverage + request-body handling -------------------------


def _wav_bytes(wav: np.ndarray, sr: int = 16000, sampwidth: int = 2) -> bytes:
    """Encode a float waveform as PCM WAV bytes at the given sample width."""
    import io
    import wave

    clipped = np.clip(wav, -1.0, 1.0)
    if sampwidth == 2:
        data = (clipped * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 3:
        vals = (clipped * 8388607.0).astype("<i4")
        data = vals.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    else:
        raise ValueError(sampwidth)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sr)
        wf.writeframes(data)
    return buf.getvalue()


def _post_wav(url, body, path="/transcribe"):
    req = urllib.request.Request(
        url + path, data=body,
        headers={"Content-Type": "audio/wav"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_wav_body_sample_widths(http_server):
    """The HTTP body decode shares audio._decode_wav, so every sample width
    load_audio accepts (incl. 24-bit) must work over the wire too — the old
    server-local parser rejected everything but 16-bit."""
    rng = np.random.default_rng(7)
    wav = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    for width in (2, 3):
        status, out = _post_wav(http_server, _wav_bytes(wav, sampwidth=width))
        assert status == 200 and "text" in out, (width, status, out)


def test_server_body_size_cap(ctc_model):
    """Bodies over max_body_bytes are rejected (413) before being read."""
    server = BatchingASRServer(ctc_model, max_batch=2, batch_window_ms=5.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(server, max_body_bytes=1024))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
        big = _wav_bytes(np.zeros(4000, np.float32))
        status, out = _post_wav(url, big)
        assert status == 413 and "larger" in out["error"]
        small = _wav_bytes(np.zeros(400, np.float32))
        status, out = _post_wav(url, small)
        assert status == 200
    finally:
        httpd.shutdown()
        server.shutdown()


def test_warmup_covers_every_reachable_graph(ctc_model):
    """Default warmup must pre-compile every (row-count, duration-bucket)
    graph a request can route to: shortform bucket edges up to the 25 s cap
    at max_batch rows, longform edges up to the 30 s VAD strict split cap
    (an unbroken speech region is only split above strict_limit_duration)
    at longform_batch rows — an unwarmed graph stalls the batch loop for a
    cold compile on first hit."""
    server = BatchingASRServer(ctc_model, max_batch=4, batch_window_ms=5.0,
                               bucket_seconds=5, longform_batch=16)
    orig = ctc_model._decode_batch
    seen = []

    def spy(wavs, word_timestamps, beam_size=1, pad_rows_to=0, bucket=0):
        seen.append((pad_rows_to, bucket, max(len(w) for w in wavs)))
        return [("", None)] * len(wavs)

    try:
        ctc_model._decode_batch = spy
        server.warmup()
        sr = 16000
        assert all(b == 5 * sr for _, b, _ in seen)
        got = {(rows, length // sr) for rows, _, length in seen}
        short = {(4, s) for s in (5, 10, 15, 20, 25)}
        long = {(16, s) for s in (5, 10, 15, 20, 25, 30)}
        # no stream-specific graphs: /transcribe_stream decodes through the
        # shortform queue and reuses the max_batch-row graphs
        assert got == short | long, got
    finally:
        ctc_model._decode_batch = orig
        server.shutdown()


def test_bucket_coarsening_preserves_output(ctc_model):
    """Serving's coarse duration buckets only add masked padding: the
    transcript and word timings must equal the 1 s-bucket result."""
    rng = np.random.default_rng(8)
    wav = (0.1 * rng.standard_normal(int(1.5 * 16000))).astype(np.float32)
    fine = ctc_model._decode_batch([wav], word_timestamps=True)
    coarse = ctc_model._decode_batch([wav], word_timestamps=True,
                                     bucket=5 * 16000)
    assert fine[0][0] == coarse[0][0]
    f_words = [(w.text, w.start, w.end) for w in (fine[0][1] or [])]
    c_words = [(w.text, w.start, w.end) for w in (coarse[0][1] or [])]
    assert f_words == c_words


def test_server_streaming_endpoint(http_server, ctc_model, tmp_path):
    """Chunked s16 PCM upload -> NDJSON events; final committed text equals
    offline transcribe for a short stream (same graphs, no trims)."""
    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.client import transcribe_stream

    rng = np.random.default_rng(9)
    t = np.arange(6 * 16000) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 300 * t)
           + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    events = transcribe_stream(http_server, wav, chunk_s=0.5)
    assert events and events[-1]["kind"] == "committed"
    committed = " ".join(e["text"] for e in events
                         if e["kind"] == "committed" and e["text"])

    path = str(tmp_path / "stream_ref.wav")
    save_wav(path, wav)
    offline = ctc_model.transcribe(path).text
    assert committed == offline


def test_server_streaming_overload(ctc_model):
    """Streams over the slot cap answer 503 immediately."""
    import http.client

    server = BatchingASRServer(ctc_model, max_batch=2, batch_window_ms=5.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # exhaust the slots without sending any audio
        while server.stream_slots.acquire(blocking=False):
            pass
        conn = http.client.HTTPConnection("127.0.0.1", httpd.server_port,
                                          timeout=30)
        conn.request("POST", "/transcribe_stream", body=b"",
                     headers={"Content-Type": "audio/l16"})
        assert conn.getresponse().status == 503
        conn.close()
    finally:
        httpd.shutdown()
        server.shutdown()


def test_server_stream_error_event_on_malformed_framing(http_server):
    """A garbled chunk-size line surfaces as a final NDJSON error event and
    a cleanly terminated chunked stream, not a truncated connection."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(http_server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=60)
    try:
        conn.putrequest("POST", "/transcribe_stream")
        conn.putheader("Content-Type", "audio/l16")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"NOT-A-HEX-SIZE\r\n")
        resp = conn.getresponse()
        assert resp.status == 200
        lines = [json.loads(x) for x in resp.read().splitlines() if x.strip()]
        assert lines and lines[-1]["kind"] == "error"
        assert "ValueError" in lines[-1]["error"]
    finally:
        conn.close()


def test_server_stream_long_upload_duplex(http_server):
    """A stream bigger than typical socket buffers must not deadlock: the
    client reads events concurrently with the upload (60 s ~= 1.9 MB)."""
    from gigaam_tpu.client import transcribe_stream

    rng = np.random.default_rng(11)
    wav = (0.1 * rng.standard_normal(60 * 16000)).astype(np.float32)
    events = transcribe_stream(http_server, wav, chunk_s=2.0, timeout=300)
    assert events and events[-1]["kind"] == "committed"


def test_server_stream_decodes_ride_the_batch_queue(ctc_model):
    """Server-side stream stride decodes must submit to the dynamic
    batching queue (shared graphs + cross-stream batching), not issue
    their own single-row decodes."""
    from gigaam_tpu.client import transcribe_stream

    server = BatchingASRServer(ctc_model, max_batch=2, batch_window_ms=5.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        seen_rows = []
        orig = ctc_model._decode_batch_submit

        def spy(wavs, *a, **kw):
            seen_rows.append(kw.get("pad_rows_to", 0))
            return orig(wavs, *a, **kw)

        ctc_model._decode_batch_submit = spy
        rng = np.random.default_rng(12)
        wav = (0.1 * rng.standard_normal(5 * 16000)).astype(np.float32)
        events = transcribe_stream(f"http://127.0.0.1:{httpd.server_port}",
                                   wav, chunk_s=1.0)
        assert events and events[-1]["kind"] == "committed"
        assert seen_rows and all(r == 2 for r in seen_rows), seen_rows
    finally:
        ctc_model._decode_batch_submit = orig
        httpd.shutdown()
        server.shutdown()


def test_server_lm_fusion(ctc_model):
    """Server-wide LM shallow fusion plumbs into every decode call."""
    from gigaam_tpu.decode.lm import NGramLM

    lm = NGramLM.train([[0, 1, 2]] * 5,
                       vocab_size=len(ctc_model.tokenizer), order=2)
    server = BatchingASRServer(ctc_model, max_batch=2, batch_window_ms=5.0,
                               beam_size=4, lm=lm, lm_weight=0.3)
    try:
        seen = []
        orig = ctc_model._decode_batch_submit

        def spy(wavs, *a, **kw):
            seen.append((kw.get("beam_size"), kw.get("lm") is not None))
            return orig(wavs, *a, **kw)

        ctc_model._decode_batch_submit = spy
        wav = (0.1 * np.random.default_rng(5)
               .standard_normal(8000)).astype(np.float32)
        req = server.submit(wav, timestamps=False)
        assert req.error is None and req.result["text"] is not None
        assert seen == [(4, True)], seen
    finally:
        ctc_model._decode_batch_submit = orig
        server.shutdown()
