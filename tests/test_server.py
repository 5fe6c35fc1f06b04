"""HTTP serving front-end: protocol, parity with direct engine runs,
streaming, and concurrent continuous batching.

The reference has no serving layer at all (SURVEY.md §2.8); this covers
the new framework's network surface end-to-end on the CPU backend: a real
ThreadingHTTPServer on an ephemeral port, driven with urllib.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import pytest

from mfa_tpu.models import llama
from mfa_tpu.serve.engine import Engine
from mfa_tpu.serve.server import make_server


@pytest.fixture(scope="module")
def server():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.key(0), cfg)
    eng = Engine(params, cfg, num_pages=64, page_size=8, max_seqs=4,
                 pages_per_seq=8)
    httpd = make_server(eng, port=0, burst=4)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, cfg, params
    httpd.shutdown()
    httpd.loop.close()
    httpd.server_close()


def _post(base, path, obj, timeout=600):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return json.loads(r.read())


def test_health_and_models(server):
    base, _, _ = server
    assert _get(base, "/health")["status"] == "ok"
    models = _get(base, "/v1/models")
    assert models["data"][0]["id"] == "mfa-tpu"


def test_completion_matches_direct_engine(server):
    base, cfg, params = server
    prompt = [1, 2, 3, 4, 5]
    resp = _post(base, "/v1/completions",
                 {"prompt": prompt, "max_tokens": 8})
    toks = resp["choices"][0]["token_ids"]
    assert len(toks) == 8
    assert resp["usage"]["completion_tokens"] == 8
    assert resp["choices"][0]["finish_reason"] == "length"

    # a fresh direct engine must produce the same greedy continuation
    eng = Engine(params, cfg, num_pages=64, page_size=8, max_seqs=4,
                 pages_per_seq=8)
    req = eng.submit(prompt, 8)
    eng.run(burst=4)
    assert toks == req.generated


def test_streaming_collects_same_tokens(server):
    base, _, _ = server
    prompt = [7, 8, 9]
    plain = _post(base, "/v1/completions",
                  {"prompt": prompt, "max_tokens": 6})["choices"][0]["token_ids"]

    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": prompt, "max_tokens": 6,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    tokens, chunks = [], 0
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":  # OpenAI protocol literal
                break
            evt = json.loads(payload)
            tokens.extend(evt["choices"][0]["token_ids"])
            chunks += 1
    assert tokens == plain
    assert chunks >= 1


def test_concurrent_requests_batch(server):
    base, _, _ = server
    prompts = [[1, 2, 3], [4, 5, 6, 7], [9, 10]]
    results = {}

    def worker(i, p):
        results[i] = _post(base, "/v1/completions",
                           {"prompt": p, "max_tokens": 5})

    threads = [threading.Thread(target=worker, args=(i, p))
               for i, p in enumerate(prompts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert set(results) == {0, 1, 2}
    for i, p in enumerate(prompts):
        # every request completes independently with the right length
        assert len(results[i]["choices"][0]["token_ids"]) == 5
        assert results[i]["usage"]["prompt_tokens"] == len(p)


def test_bad_requests(server):
    base, _, _ = server
    for body, frag in [
        ({"prompt": "hello", "max_tokens": 4}, "tokenizer"),
        ({"prompt": [], "max_tokens": 4}, "non-empty"),
        ({"prompt": [1, 2], "max_tokens": 0}, "max_tokens"),
        ({"prompt": [1, 2], "max_tokens": 10_000}, "longer"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/v1/completions", body)
        assert ei.value.code == 400
        assert frag in json.loads(ei.value.read())["error"]["message"]


def test_logprobs_in_response(server):
    base, _, _ = server
    resp = _post(base, "/v1/completions",
                 {"prompt": [2, 4, 6], "max_tokens": 5, "logprobs": 1})
    ch = resp["choices"][0]
    lps = ch["logprobs"]["token_logprobs"]
    assert len(lps) == len(ch["token_ids"]) == 5
    assert all(isinstance(x, float) and x <= 0.0 for x in lps)
