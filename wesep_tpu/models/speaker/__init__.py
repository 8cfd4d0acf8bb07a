"""Native speaker-encoder zoo (the reference imports these from the external
wespeaker package — `from wespeaker.models.speaker_model import
get_speaker_model`, /root/reference/wesep/models/bsrnn.py:9,217; we implement
TPU-native equivalents in-repo).

Registry names mirror the wespeaker spk_model strings used in the recipe
configs (examples/librimix/tse/v2/confs/bsrnn.yaml:57-78): ResNet18/34/...,
ECAPA_TDNN_c512/c1024 (+ _GLOB_ variants), CAMPPlus.

Contract: model(feats [B, T, F_mel], train) -> embedding [B, embed_dim]
(or a tuple whose LAST element is the embedding, like wespeaker's
two-emb-layer ResNets — callers take [-1], cf. bsrnn.py:352-356).
"""


def get_speaker_model(model_name: str):
    if model_name is None:
        raise ValueError(
            "joint_training=True requires spk_model (e.g. 'ResNet34', "
            "'ECAPA_TDNN_GLOB_c512', 'CAMPPlus')"
        )
    if model_name.startswith("ResNet"):
        from wesep_tpu.models.speaker import resnet

        return getattr(resnet, model_name)
    if model_name.startswith("ECAPA_TDNN"):
        from wesep_tpu.models.speaker.ecapa import make_ecapa

        return make_ecapa(model_name)
    if model_name.startswith("CAMPPlus"):
        from wesep_tpu.models.speaker.campplus import CAMPPlus

        return CAMPPlus
    raise NotImplementedError(f"unknown speaker model {model_name!r}")
