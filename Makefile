# mazu_tpu build/test/bench entry points

.PHONY: native test test-fast bench clean

native: native/libmazu_host.so

native/libmazu_host.so: native/mazu_host.cpp
	g++ -O3 -march=native -fopenmp -shared -fPIC -o $@ $<

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

clean:
	rm -f native/libmazu_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
