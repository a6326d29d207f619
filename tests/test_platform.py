def test_platform():
    import jax
    assert jax.default_backend() == 'cpu'
    assert len(jax.devices()) == 8, jax.devices()


def test_select_platform_pins_config():
    from enspara_tpu.util.backend import select_platform
    import jax
    # already on cpu in tests; re-pinning must be a safe no-op
    select_platform('cpu')
    assert jax.default_backend() == 'cpu'
    # unset env -> no-op
    select_platform(None)
    assert jax.default_backend() == 'cpu'


def test_compile_cache_dir_is_host_fingerprinted(tmp_path, monkeypatch):
    import jax
    from enspara_tpu.util.compile_cache import (_host_fingerprint,
                                                enable_compilation_cache)
    fp = _host_fingerprint()
    assert len(fp) == 12
    monkeypatch.setenv('ENSPARA_TPU_CACHE_DIR', str(tmp_path))
    enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / fp)
