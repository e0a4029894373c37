"""``python -m datahub_spark [config.env]`` — the cmd/datahub/main.go
binary: load the environment config (optional ``.env``-format file
argument, process env wins over it) and run a served instance until
SIGINT/SIGTERM."""

from __future__ import annotations

import logging
import sys

from datahub_spark.app import run
from datahub_spark.config import load_config


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) > 1 or (argv and argv[0] in ("-h", "--help")):
        print("usage: python -m datahub_spark [config.env]")
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    config_file = argv[0] if argv else None
    config = load_config(config_file)
    logging.basicConfig(
        level=getattr(logging, config.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s %(message)s")
    run(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
