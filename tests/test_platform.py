def test_platform():
    import jax
    assert jax.default_backend() == 'cpu'
    assert len(jax.devices()) == 8, jax.devices()
