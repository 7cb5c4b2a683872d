# Developer convenience targets (the reference's Makefile analog).

.PHONY: install test test-all bench native clean

install:
	pip install -e . -q --no-build-isolation

test:
	python -m pytest tests/ -x -q

test-all:  ## includes the slow 20^3 configuration-matrix fixtures
	python -m pytest tests/ -q -m ""

bench:
	python bench.py

native:
	g++ -O2 -shared -fPIC -o csrc/libspectral_io.so csrc/io.cpp

clean:
	rm -f csrc/libspectral_io.so
	find . -name __pycache__ -type d -exec rm -rf {} +
