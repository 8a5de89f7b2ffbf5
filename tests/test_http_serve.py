"""HTTP serving daemon test: concurrent clients through the engine loop."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.cli.serve import _Server, make_handler
from aqlm_tpu.models import llama
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig


def test_http_generate_concurrent(key):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    engine = Engine(params, cfg, ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,)))
    server = _Server(engine, tokenizer=None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"

        # three concurrent requests through 2 slots
        results = {}

        def client(i, prompt):
            body = json.dumps({"prompt_ids": prompt, "max_new_tokens": 4}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())["tokens"]

        prompts = [[1, 2, 3], [7, 8], [4, 4, 4, 4]]
        threads = [threading.Thread(target=client, args=(i, p)) for i, p in enumerate(prompts)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        assert sorted(results) == [0, 1, 2]
        assert all(len(v) == 4 for v in results.values())

        # determinism: greedy result matches a direct engine run
        solo = Engine(params, cfg, ServeConfig(max_batch=1, max_len=64, prefill_buckets=(8,)))
        expect = solo.generate([np.asarray(prompts[0], np.int32)], SamplingParams(max_new_tokens=4))[0]
        assert results[0] == expect

        # OpenAI-compatible surface: /v1/models, /v1/completions, SSE stream
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/models") as r:
            models = json.loads(r.read())
            assert models["data"][0]["object"] == "model"

        body = json.dumps({"prompt_ids": prompts[0], "max_tokens": 4}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            comp = json.loads(r.read())
        assert comp["object"] == "text_completion"
        assert comp["choices"][0]["token_ids"] == expect
        assert comp["usage"]["completion_tokens"] == 4

        body = json.dumps({"prompt_ids": prompts[0], "max_tokens": 4, "stream": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"},
        )
        streamed = []
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            for line in r:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                streamed.extend(json.loads(payload)["choices"][0]["token_ids"])
        assert streamed == expect
    finally:
        httpd.shutdown()
        server.stop()


def test_http_over_speculative_engine():
    """The daemon over a speculative engine with prefix caching: concurrent
    clients sharing a prompt prefix get exactly the plain engine's tokens."""
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    draft = llama.init_random_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    serve_cfg = ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,), min_prefix=4)
    prompts = [[9, 9, 9, 9, 1], [9, 9, 9, 9, 2, 3], [9, 9, 9, 9, 7]]

    plain = Engine(params, cfg, serve_cfg)
    ref = plain.generate([np.asarray(p, np.int32) for p in prompts],
                         SamplingParams(max_new_tokens=5))

    engine = Engine(params, cfg, serve_cfg, draft_params=draft, draft_cfg=cfg, spec_k=2)
    server = _Server(engine, tokenizer=None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        results = {}

        def client(i, prompt):
            body = json.dumps({"prompt_ids": prompt, "max_new_tokens": 5}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=180) as r:
                results[i] = json.loads(r.read())["tokens"]

        threads = [threading.Thread(target=client, args=(i, p)) for i, p in enumerate(prompts)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        assert [results[i] for i in range(3)] == ref, (results, ref)
    finally:
        httpd.shutdown()
        server.stop()
