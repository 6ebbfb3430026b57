"""Training entry point (reference-parity CLI). See sed_tpu/cli/main.py."""

from sed_tpu.cli.main import main

if __name__ == "__main__":
    main()
