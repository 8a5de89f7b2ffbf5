"""Minimal HTTP serving daemon over the continuous-batching engine.

The reference delegates serving to vLLM (notebooks/aqlm_vllm.ipynb); this is
the native equivalent: a stdlib HTTP server feeding requests into the Engine,
which batches them continuously across clients.

    python -m aqlm_tpu.cli.serve MODEL_DIR --port 8900 --mode int8 --kv_int8

    POST /generate {"prompt": "...", "max_new_tokens": 64, "temperature": 0.7}
      or {"prompt_ids": [1, 2, 3], ...}
    POST /v1/completions  (OpenAI-compatible, incl. "stream": true SSE)
    GET  /v1/models
    GET  /health
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from aqlm_tpu.cli.common import dtype_from_str, load_tokenizer, resolve_model
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_path")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--max_len", type=int, default=2048)
    p.add_argument("--prefill_buckets", nargs="+", type=int, default=[64, 256, 1024])
    p.add_argument("--kv_int8", action="store_true")
    p.add_argument("--mode", choices=["reference", "codes", "int8", "int4"], default="int8")
    p.add_argument("--dtype", choices=["auto", "float32", "bfloat16"], default="bfloat16")
    p.add_argument("--draft_model", type=str, default=None,
                   help="draft model spec: enables batched speculative decoding")
    p.add_argument("--draft_mode", choices=["reference", "codes", "int8", "int4"], default=None)
    p.add_argument("--spec_k", type=int, default=4)
    p.add_argument("--tp", type=int, default=1,
                   help=">1: tensor-parallel serving over a model-axis mesh of this size")
    p.add_argument("--decode_chunk", type=int, default=1,
                   help=">1: emit this many tokens per compiled decode (one host sync per chunk)")
    p.add_argument("--no_compile_cache", action="store_true",
                   help="disable the persistent XLA compile cache (on by "
                        "default: repeat cold starts replay executables "
                        "from disk instead of recompiling)")
    return p


class _Server:
    """Single background loop drives Engine.step(); requests enqueue and wait."""

    def __init__(self, engine: Engine, tokenizer, model_id: str = "aqlm-tpu"):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_id = model_id
        self._submissions: "queue.Queue" = queue.Queue()
        self._done: dict[int, threading.Event] = {}
        self._lock = threading.Lock()
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while self._running:
            try:
                while True:
                    prompt, sampling, box = self._submissions.get_nowait()
                    rid = self.engine.submit(prompt, sampling)
                    with self._lock:
                        self._done[rid] = box
                    box["rid"] = rid
                    box["accepted"].set()
            except queue.Empty:
                pass
            if self.engine._active or self.engine._pending:
                self.engine.step()
                with self._lock:
                    for rid, box in list(self._done.items()):
                        req = self.engine.get_request(rid)
                        stream_q = box.get("stream_q")
                        if stream_q is not None:
                            new = req.generated[box.get("pushed", 0):]
                            if new:
                                for t in new:
                                    stream_q.put(int(t))
                                box["pushed"] = len(req.generated)
                        if req.done:
                            box["tokens"] = req.generated
                            box["logprobs"] = req.logprobs
                            if stream_q is not None:
                                stream_q.put(None)  # end-of-stream sentinel
                            box["finished"].set()
                            del self._done[rid]
            else:
                import time

                time.sleep(0.005)

    def generate(self, prompt_ids, sampling: SamplingParams, timeout: float = 600.0):
        box = {"accepted": threading.Event(), "finished": threading.Event()}
        self._submissions.put((prompt_ids, sampling, box))
        if not box["finished"].wait(timeout):
            raise TimeoutError("generation timed out")
        return box["tokens"], box["logprobs"]

    def generate_stream(self, prompt_ids, sampling: SamplingParams):
        """Submit and yield tokens as the engine produces them."""
        box = {
            "accepted": threading.Event(),
            "finished": threading.Event(),
            "stream_q": queue.Queue(),
            "pushed": 0,
        }
        self._submissions.put((prompt_ids, sampling, box))
        while True:
            tok = box["stream_q"].get(timeout=600.0)
            if tok is None:
                return
            yield tok

    def stop(self):
        self._running = False


def make_handler(server: _Server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, {"status": "ok"})
            elif self.path == "/v1/models":
                self._reply(200, {
                    "object": "list",
                    "data": [{"id": server.model_id, "object": "model", "owned_by": "aqlm_tpu"}],
                })
            else:
                self._reply(404, {"error": "unknown path"})

        def _parse_request(self, req, openai: bool):
            if "prompt_ids" in req:
                ids = np.asarray(req["prompt_ids"], np.int32)
            else:
                assert server.tokenizer is not None, "text prompts need a tokenizer"
                ids = np.asarray(server.tokenizer(req["prompt"]).input_ids, np.int32)
            max_new = req.get("max_tokens" if openai else "max_new_tokens", 128)
            sampling = SamplingParams(
                temperature=float(req.get("temperature", 0.0)),
                top_p=float(req.get("top_p", 1.0)),
                max_new_tokens=int(max_new),
                eos_token_id=getattr(server.tokenizer, "eos_token_id", None)
                if server.tokenizer
                else None,
            )
            return ids, sampling

        def _completion_payload(self, tokens, text, logprobs=None, finish="stop"):
            choice = {"index": 0, "text": text, "finish_reason": finish,
                      "token_ids": [int(t) for t in tokens]}
            if logprobs is not None:
                choice["logprobs"] = {"token_logprobs": [round(float(l), 6) for l in logprobs]}
            return {
                "id": "cmpl-aqlm",
                "object": "text_completion",
                "model": server.model_id,
                "choices": [choice],
                "usage": {"completion_tokens": len(tokens)},
            }

        def _stream_completion(self, ids, sampling):
            """OpenAI-style SSE: one chunk per new token, then [DONE]."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            sent_text = ""
            tokens = []
            for tok in server.generate_stream(ids, sampling):
                tokens.append(tok)
                if server.tokenizer is not None:
                    full = server.tokenizer.decode(tokens)
                    delta, sent_text = full[len(sent_text):], full
                else:
                    delta = ""
                chunk = {
                    "id": "cmpl-aqlm", "object": "text_completion",
                    "model": server.model_id,
                    "choices": [{"index": 0, "text": delta, "finish_reason": None,
                                 "token_ids": [tok]}],
                }
                self.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
                self.wfile.flush()
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()

        def do_POST(self):
            openai = self.path == "/v1/completions"
            if self.path != "/generate" and not openai:
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                ids, sampling = self._parse_request(req, openai)
                if openai and req.get("stream"):
                    self._stream_completion(ids, sampling)
                    return
                tokens, logprobs = server.generate(ids, sampling)
                text = server.tokenizer.decode(tokens) if server.tokenizer is not None else ""
                if openai:
                    self._reply(200, self._completion_payload(
                        tokens, text,
                        logprobs=logprobs if req.get("logprobs") else None,
                    ))
                else:
                    out = {"tokens": [int(t) for t in tokens]}
                    if server.tokenizer is not None:
                        out["text"] = text
                    self._reply(200, out)
            except Exception as e:  # surface errors to the client
                self._reply(500, {"error": repr(e)})

    return Handler


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.no_compile_cache:
        from aqlm_tpu.cli.common import enable_compile_cache

        enable_compile_cache()
    params, cfg, _ = resolve_model(args.model_path, dtype=dtype_from_str(args.dtype), mode=args.mode)
    tokenizer = load_tokenizer(args.model_path)
    spec_kw = {}
    if args.draft_model is not None:
        dparams, dcfg, _ = resolve_model(
            args.draft_model, dtype=dtype_from_str(args.dtype),
            mode=args.draft_mode or args.mode,
        )
        spec_kw = dict(draft_params=dparams, draft_cfg=dcfg, spec_k=args.spec_k)
    serve_cfg = ServeConfig(
        max_batch=args.max_batch, max_len=args.max_len,
        prefill_buckets=tuple(args.prefill_buckets), kv_quantized=args.kv_int8,
        decode_chunk=args.decode_chunk,
    )
    if args.tp > 1:
        from aqlm_tpu.parallel import make_mesh
        from aqlm_tpu.serve.tp_engine import TPEngine

        engine = TPEngine(params, cfg, serve_cfg, mesh=make_mesh(model=args.tp), **spec_kw)
    else:
        engine = Engine(params, cfg, serve_cfg, **spec_kw)
    server = _Server(engine, tokenizer, model_id=args.model_path.rstrip("/").split("/")[-1])
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(
        f"serving on http://{args.host}:{args.port} "
        f"(POST /generate, POST /v1/completions, GET /v1/models, GET /health)"
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
