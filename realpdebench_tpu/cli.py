"""`realpdebench-tpu` command-line interface.

Parity with the reference CLI (`realpdebench/cli.py:12-138`): a `download`
subcommand with pattern-based HF snapshotting, a safe `--what metadata`
default, `--dry-run` returning resolved patterns without network, plus
framework-native `train` / `eval` / `train-surrogate` / `convert` subcommands
(the reference exposes those as `python -m` scripts; both forms work here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

from realpdebench_tpu import __version__
from realpdebench_tpu.data.hf_download import (
    ALL_SCENARIOS,
    download_realpdebench,
)


def _add_download_subcommand(subparsers) -> None:
    p = subparsers.add_parser(
        "download",
        help="Download RealPDEBench datasets/metadata from Hugging Face.",
    )
    p.add_argument("--dataset-root", required=True)
    p.add_argument("--scenario", action="append",
                   choices=list(ALL_SCENARIOS),
                   help="Repeatable; or pass --all.")
    p.add_argument("--all", action="store_true")
    p.add_argument("--what", default="metadata",
                   choices=["metadata", "hf_dataset", "all"],
                   help="Default: metadata (safe).")
    p.add_argument("--dataset-type", action="append",
                   choices=["real", "numerical"])
    p.add_argument("--split", action="append",
                   choices=["train", "val", "test"])
    p.add_argument("--include-surrogate-train", action="store_true")
    p.add_argument("--repo-id", default="AI4Science-WestlakeU/RealPDEBench")
    p.add_argument("--endpoint", default=os.environ.get("HF_ENDPOINT"))
    p.add_argument("--revision", default=None)
    p.add_argument("--token", default=None)
    p.add_argument("--dry-run", action="store_true",
                   help="Print resolved allow_patterns without downloading.")
    p.set_defaults(func=_cmd_download)


def _cmd_download(args) -> int:
    scenarios = list(ALL_SCENARIOS) if args.all else (args.scenario or [])
    if not scenarios:
        raise SystemExit("Please pass at least one --scenario or use --all.")
    try:
        result = download_realpdebench(
            dataset_root=args.dataset_root,
            scenarios=scenarios,
            what=args.what,
            dataset_types=args.dataset_type,
            splits=args.split,
            include_surrogate_train=bool(args.include_surrogate_train),
            repo_id=args.repo_id,
            endpoint=args.endpoint,
            revision=args.revision,
            token=args.token,
            dry_run=bool(args.dry_run),
        )
    except RuntimeError as e:
        print(str(e), file=sys.stderr)
        return 2
    print(json.dumps(result, indent=2, sort_keys=True))
    return 0


def _add_passthrough(subparsers, name, module, help_):
    p = subparsers.add_parser(name, help=help_, add_help=False)
    p.set_defaults(func=lambda args: _run_module(module, args.rest))
    p.add_argument("rest", nargs=argparse.REMAINDER)


def _run_module(module_main, rest) -> int:
    sys.argv = [sys.argv[0]] + list(rest)
    module_main()
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="realpdebench-tpu")
    parser.add_argument("--version", action="version",
                        version=f"realpdebench_tpu {__version__}")
    subparsers = parser.add_subparsers(dest="command", required=True)
    _add_download_subcommand(subparsers)

    from realpdebench_tpu.train.__main__ import main as train_main
    from realpdebench_tpu.eval.__main__ import main as eval_main
    from realpdebench_tpu.eval.parity import main as parity_main
    from realpdebench_tpu.tools.convert_hdf5_to_hf import main as convert_main
    from realpdebench_tpu.train.surrogate import main as surrogate_main

    _add_passthrough(subparsers, "train", train_main,
                     "Train a model (same flags as python -m realpdebench_tpu.train)")
    _add_passthrough(subparsers, "eval", eval_main,
                     "Evaluate a checkpoint")
    _add_passthrough(subparsers, "parity", parity_main,
                     "Side-by-side reference-torch vs TPU eval of a .pth")
    _add_passthrough(subparsers, "train-surrogate", surrogate_main,
                     "Train the combustion surrogate")
    _add_passthrough(subparsers, "convert", convert_main,
                     "Convert HDF5 trees to the Arrow V2 layout")
    from realpdebench_tpu.interop.torch_export import main as export_main

    _add_passthrough(subparsers, "export-torch", export_main,
                     "Export an orbax checkpoint to a reference .pth")
    return parser


_PASSTHROUGH = ("train", "eval", "parity", "train-surrogate", "convert",
                "export-torch")


def main(argv: Optional[list] = None) -> None:
    if argv is None:
        argv = sys.argv[1:]
    # argparse's REMAINDER does not capture leading optionals after the
    # subcommand (`train --config x` errors), so dispatch passthrough
    # subcommands before argparse sees their flags
    if argv and argv[0] in _PASSTHROUGH:
        from realpdebench_tpu.train.__main__ import main as train_main
        from realpdebench_tpu.eval.__main__ import main as eval_main
        from realpdebench_tpu.eval.parity import main as parity_main
        from realpdebench_tpu.tools.convert_hdf5_to_hf import main as convert_main
        from realpdebench_tpu.train.surrogate import main as surrogate_main

        from realpdebench_tpu.interop.torch_export import main as export_main

        target = {"train": train_main, "eval": eval_main,
                  "parity": parity_main,
                  "train-surrogate": surrogate_main,
                  "convert": convert_main,
                  "export-torch": export_main}[argv[0]]
        raise SystemExit(_run_module(target, argv[1:]))
    parser = build_parser()
    args = parser.parse_args(argv)
    rc = args.func(args)
    raise SystemExit(rc)


if __name__ == "__main__":
    main(sys.argv[1:])
