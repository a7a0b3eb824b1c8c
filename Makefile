# snappytpu build/test/bench entry points (reference analog: makefile:1-13,
# which shipped 4 unoptimized gcc targets; here the native lib builds -O3 and
# the Python layer needs no build step).

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++17 -shared -fPIC
NATIVE_SRC = snappytpu/cpu/csrc/snappy_cpu.cc
NATIVE_LIB = snappytpu/cpu/csrc/libsnappy_cpu.so

.PHONY: all native test test-fast bench clean sanitize

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	$(CXX) $(CXXFLAGS) -o $@ $<

# ASan/UBSan build of the native runtime (SURVEY.md §5.2 — the reference
# shipped no sanitizer or even -O flags)
sanitize:
	$(CXX) -O1 -g -fsanitize=address,undefined -std=c++17 -shared -fPIC \
	  -o $(NATIVE_LIB) $(NATIVE_SRC)

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q --ignore=tests/test_jax_encoder.py \
	  --ignore=tests/test_jax_decoder.py --ignore=tests/test_pipeline.py \
	  --ignore=tests/test_mesh.py

bench: native
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
