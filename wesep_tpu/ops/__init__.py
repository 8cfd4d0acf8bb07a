"""Signal/compute kernels (pure functions over jnp arrays).

Import from the submodules directly, e.g.::

    from wesep_tpu.ops.stft import stft, istft, hann_window
    from wesep_tpu.ops.fbank import kaldi_fbank, speaker_feat
    from wesep_tpu.ops.rnn import bilstm
"""
