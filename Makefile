native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
	    native/fastio.cpp native/align_engine.cpp \
	    -o metagraph_tpu/native/_fastio.so

test:
	PYTHONPATH=. JAX_PLATFORMS=cpu python -m pytest tests/ -q

.PHONY: native test
