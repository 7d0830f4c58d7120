from . import activations, dsp, kiss99, mulaw, tables  # noqa: F401
