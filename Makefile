# CI-style entry points (the .github/workflows/ci.yml analog)

.PHONY: all native test bench components demo clean

all: native test

native:
	g++ -O3 -std=c++17 -shared -fPIC -march=native -fno-exceptions \
	    -fvisibility=hidden -Wall -pthread -ffp-contract=off \
	    pixo_tpu/native/core.cpp -o pixo_tpu/native/libpixo_core.so

test: native
	python -m pytest tests/ -x -q

bench: native
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
