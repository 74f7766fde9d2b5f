# Build / test entry points (the analog of the reference's
# scripts/10..17 build scripts).

CXX ?= g++
# Same flags as the on-demand builder (native/__init__.py _build).
CXXFLAGS ?= -O3 -march=native -funroll-loops -shared -fPIC -std=c++17

native: stringsext_tpu/native/libemitter.so

stringsext_tpu/native/libemitter.so: stringsext_tpu/native/emitter.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

bench-suite: native
	python scripts/bench_suite.py

fuzz: native
	python scripts/fuzz.py 300

man: docs/stringsext-tpu.1

docs/stringsext-tpu.1: docs/MANUAL.md scripts/make_man.py
	python scripts/make_man.py

clean:
	rm -f stringsext_tpu/native/libemitter.so

.PHONY: native test bench bench-suite fuzz man clean
