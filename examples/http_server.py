"""Serve a model over HTTP (OpenAI-style completions).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python examples/http_server.py
Then: curl -s localhost:8000/v1/completions -d '{"prompt":[1,2,3],"max_tokens":8}'
      curl -N  localhost:8000/v1/completions -d '{"prompt":[1,2,3],"max_tokens":8,"stream":true}'
      curl -s localhost:8000/v1/completions -d \
        '{"prompt":[1,2,3],"max_tokens":8,"temperature":0.8,"top_p":0.9,
          "repetition_penalty":1.3,"stop":[[42]],"logprobs":1}'
      curl -s localhost:8000/stats

Uses a small randomly initialized model by default; load real weights with
mfa_tpu.models.convert.from_hf (see examples/serve.py) and pass a
transformers tokenizer via `tokenizer=` to speak text instead of token ids.
"""

import argparse

import jax

from mfa_tpu.models import llama
from mfa_tpu.serve.engine import Engine
from mfa_tpu.serve.server import serve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--quant", default=None, choices=[None, "int8", "fp8"])
    ap.add_argument("--burst", type=int, default=8)
    args = ap.parse_args()

    cfg = llama.LlamaConfig.tiny(dim=args.dim, layers=args.layers,
                                 heads=4, kv_heads=2, ffn=args.dim * 2)
    params = llama.init_params(jax.random.key(0), cfg)
    eng = Engine(params, cfg, num_pages=256, page_size=16, max_seqs=8,
                 pages_per_seq=16, quant_dtype=args.quant)
    print(f"serving on :{args.port} (ctrl-c to stop)")
    serve(eng, port=args.port, burst=args.burst)


if __name__ == "__main__":
    main()
