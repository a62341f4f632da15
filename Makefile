# Build/test entry points mirroring the reference's Makefile targets
# (reference Makefile:26-79, programs/Makefile:54-173).

PY ?= python

.PHONY: all test fuzz deepfuzz smoke bench fullbench oracle native check clean

all: native oracle

test:
	$(PY) -m pytest tests/ -q -m "not slow"

fuzz:
	$(PY) -m pytest tests/test_fuzz.py -q -m "not slow"

# reference-scale randomized fuzzing (fuzzer.c:54 default 128K iterations);
# nightly CI job — FSE_TPU_FUZZ_ITERS scales every randomized suite
deepfuzz:
	FSE_TPU_FUZZ_ITERS=$(or $(ITERS),10000) \
	  $(PY) -m pytest tests/test_fuzz.py tests/test_deep_fuzz.py -q

# CI gate: every bench.py section end-to-end on the CPU backend
smoke:
	$(PY) bench.py --smoke

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
