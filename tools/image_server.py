#!/usr/bin/env python
"""Launch the msgpack-RPC query front-end — the ``image-server`` binary
analog (``src/image_server_main.cc:80-93``: default port 9191)."""

import argparse
import signal
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--ip", default="0.0.0.0")
    p.add_argument("-p", "--port", type=int, default=9191)
    p.add_argument("-k", "--knn", type=int, default=10)
    args = p.parse_args()

    from verticut_tpu.index.mih import load_index
    from verticut_tpu.service import ImageSearchServer

    index = load_index(args.index)
    srv = ImageSearchServer(index, host=args.ip, port=args.port,
                            default_knn=args.knn).start()
    print(f"serving {index.n} codes on {args.ip}:{srv.port}")
    signal.sigwait({signal.SIGINT, signal.SIGTERM})
    srv.stop()


if __name__ == "__main__":
    main()
