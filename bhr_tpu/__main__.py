"""`python -m bhr_tpu` runs the application mode (app.py)."""

from .app import main

if __name__ == "__main__":
    raise SystemExit(main())
