native:
	g++ -O3 -shared -fPIC -std=c++17 native/fastio.cpp -o metagraph_tpu/native/_fastio.so

test:
	PYTHONPATH=. JAX_PLATFORMS=cpu python -m pytest tests/ -q

.PHONY: native test
