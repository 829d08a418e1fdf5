#!/usr/bin/env python
"""Web UI entry point (reference: app.py Gradio space, here a zero-dependency
HTTP server over the same pipeline).

    python app.py [--port 7860] [--tiny] [--ckpt DIR]
"""

from __future__ import annotations

import argparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from predict import Predictor
    from v2ap_tpu.serving.server import serve

    predictor = Predictor(tiny=args.tiny)
    predictor.setup(args.ckpt)
    serve(predictor.pipeline, host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
