# CI-style entry points (mirrors .github/workflows/ci.yml)

.PHONY: all native native-pgo test bench components demo clean ci install cov

all: native test

# the full local CI pipeline: native build -> install check -> tests ->
# bench smoke (CPU backend, reduced size — same stages as the workflow)
ci: native
	pip install -e . --no-deps --no-build-isolation -q
	pixo-tpu --version
	PIXO_TPU_COV=1 python -m pytest tests/ -x -q
	python tests/support/coverage_lite.py --check 85
	PIXO_TPU_BENCH_CPU=1 BENCH_SIZE=256 BENCH_BATCH=4 python bench.py

# coverage report without the rest of the ci pipeline (writes
# .coverage_lite.json; stdlib sys.monitoring collector — pytest-cov is
# not installable in the zero-egress harness)
cov: native
	PIXO_TPU_COV=1 python -m pytest tests/ -x -q
	python tests/support/coverage_lite.py --check 85 --worst 15

install:
	pip install -e . --no-deps --no-build-isolation

native:
	g++ -O3 -std=c++17 -shared -fPIC -march=native -fno-exceptions \
	    -fvisibility=hidden -Wall -pthread -ffp-contract=off \
	    pixo_tpu/native/core.cpp -o pixo_tpu/native/libpixo_core.so

# profile-guided build: instrumented compile -> deterministic training
# battery (pixo_tpu/native/_pgo_train.py, CPU backend, host tiers) ->
# -fprofile-use recompile. Output bytes are identical to `native`; the
# branchy hot loops (DEFLATE matcher, entropy packers) run 10-15% faster.
# This is also what a fresh `import pixo_tpu.native` does when core.cpp
# is newer than the .so (see _try_build).
native-pgo:
	g++ -O3 -std=c++17 -shared -fPIC -march=native -fno-exceptions \
	    -fvisibility=hidden -Wall -pthread -ffp-contract=off \
	    -fprofile-generate=pixo_tpu/native/.pgo \
	    pixo_tpu/native/core.cpp -o pixo_tpu/native/libpixo_core.so
	PIXO_TPU_NO_PGO=1 python pixo_tpu/native/_pgo_train.py
	g++ -O3 -std=c++17 -shared -fPIC -march=native -fno-exceptions \
	    -fvisibility=hidden -Wall -pthread -ffp-contract=off \
	    -fprofile-use=pixo_tpu/native/.pgo -fprofile-correction \
	    -Wno-missing-profile \
	    pixo_tpu/native/core.cpp -o pixo_tpu/native/libpixo_core.so

test: native
	python -m pytest tests/ -x -q

bench: native-pgo
	python bench.py

components: native
	python benches/components.py --device cpu

comparison: native
	python benches/comparison.py --device cpu

demo: native
	python examples/demo.py

clean:
	rm -f pixo_tpu/native/libpixo_core.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
