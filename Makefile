# Build/test entry points mirroring the reference's Makefile targets
# (reference Makefile:26-79, programs/Makefile:54-173).

PY ?= python

.PHONY: all test fuzz bench fullbench oracle native check clean

all: native oracle

test:
	$(PY) -m pytest tests/ -q

fuzz:
	$(PY) -m pytest tests/test_fuzz.py -q

bench:
	$(PY) bench.py

fullbench:
	$(PY) -m finitestateentropy_tpu.benchmarks.fullbench

oracle:
	sh tools/ref/build.sh

native:
	sh native/build.sh

# `make check` = the reference's round-trip gate (probagen -> compress with
# each codec -> decompress -> diff), plus byte-equality vs the oracle CLI
check: oracle native
	$(PY) -m pytest tests/test_frame_cli.py tests/test_native.py -q

clean:
	rm -f native/libturbofse.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
