"""`python -m phys_autodiff_tpu` — see phys_autodiff_tpu/cli.py."""

from phys_autodiff_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
