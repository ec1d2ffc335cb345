# Task runner — the analog of the reference's justfile (reference:
# justfile:8-104: setup/lab/run/build/test/fmt/lint/info/clean).

PY ?= python

.PHONY: all setup native run bench bench-suite tpu-check tpu-check-quick \
        test lab fmt lint info clean

all: native test

# environment bootstrap (the reference's `just setup`, justfile:8-28):
# venv + editable install + jupyter kernel + native runtime. On images with
# jax/jupyter preinstalled this is a no-op-safe refresh.
setup:
	$(PY) -m venv --system-site-packages .venv 2>/dev/null || true
	. .venv/bin/activate 2>/dev/null; $(PY) -m pip install -e . 2>/dev/null \
	  || echo "pip install skipped (offline image: deps are preinstalled)"
	$(PY) -m ipykernel install --user --name bhr_tpu \
	  --display-name "Python (bhr_tpu)" 2>/dev/null \
	  || echo "ipykernel registration skipped"
	$(MAKE) -s -C native

# build the native C++ I/O runtime (auto-built on first use too)
native:
	$(MAKE) -s -C native

# headless real-time animation (the reference's `just run`)
run: native
	$(PY) -m bhr_tpu.app --frames 120 --perf-log dev

# headline benchmark -> one JSON line
bench:
	$(PY) bench.py

# full BENCHMARKS.md table, one session -> measurements/bench_suite_*.json
# (compare two runs with scripts/bench_compare.py)
bench-suite:
	$(PY) scripts/bench_suite.py

# on-device regression gate: smoke + bit-parity + golden --check + bench
# asserts + profiler guard -> one verdict JSON line. MANDATORY before
# committing kernel changes (CPU tests run Pallas in interpret mode and
# cannot catch Mosaic compile bugs or numerics/perf regressions).
# `make tpu-check-quick` skips the 4K golden config + exact-tier bench.
tpu-check:
	$(PY) scripts/tpu_check.py

tpu-check-quick:
	$(PY) scripts/tpu_check.py --quick

# CPU test suite with 8 virtual devices
test:
	$(PY) -m pytest tests/ -q

# JupyterLab with the rendering notebook (the reference's `just lab`)
lab:
	jupyter lab notebooks/

fmt:
	$(PY) -m black bhr_tpu tests *.py 2>/dev/null || echo "black not installed; skipping"

lint:
	$(PY) -m ruff check bhr_tpu tests 2>/dev/null || echo "ruff not installed; skipping"

info:
	$(PY) -c "import jax, bhr_tpu; print('bhr_tpu', bhr_tpu.__version__); print('jax', jax.__version__); print('devices', jax.devices())"

clean:
	$(MAKE) -s -C native clean
	rm -rf .pytest_cache .jax_cache bhr_tpu/**/__pycache__ bhr_tpu/__pycache__ tests/__pycache__
