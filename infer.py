"""Inference entry point (fixed reference infer.py). See sed_tpu/cli/infer.py."""

from sed_tpu.cli.infer import main

if __name__ == "__main__":
    main()
