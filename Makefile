# ndrustfft_tpu build/test entry points

NATIVE_SO = ndrustfft_tpu/native/libndplanner.so

.PHONY: all native test bench examples clean

all: native

native: $(NATIVE_SO)

$(NATIVE_SO): ndrustfft_tpu/native/planner.cpp
	g++ -O2 -shared -fPIC -o $@ $<

# PYTHONPATH= bypasses the axon sitecustomize PJRT registration: with the
# tunnel wedged, ANY first jax use in a default process blocks in the
# plugin's connect-retry loop even under JAX_PLATFORMS=cpu (NOTES_TPU.md)
test: native
	PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -q

bench: native
	python bench.py

examples: native
	python examples/fft1.py && python examples/fft2.py && \
	python examples/rfft2.py && python examples/fft_norm.py && \
	python examples/poisson.py && python examples/any_n.py && \
	python examples/vorticity2d.py && python examples/poisson_dirichlet.py && \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/pencil3d.py

clean:
	rm -f $(NATIVE_SO)
	find . -name __pycache__ -type d -exec rm -rf {} +
