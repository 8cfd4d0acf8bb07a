"""Model registry: name-prefix dispatch like the reference
(/root/reference/wesep/models/__init__.py:10-27)."""


def get_model(model_name: str):
    if model_name.startswith("ConvTasNet"):
        from wesep_tpu.models.convtasnet import ConvTasNet
        return ConvTasNet
    elif model_name.startswith("BSRNN_Multi"):
        from wesep_tpu.models.bsrnn_multi_optim import BSRNN_Multi
        return BSRNN_Multi
    elif model_name.startswith("BSRNN_Feats"):
        from wesep_tpu.models.bsrnn_feats import BSRNN_Feats
        return BSRNN_Feats
    elif model_name.startswith("BSRNN"):
        from wesep_tpu.models.bsrnn import BSRNN
        return BSRNN
    elif model_name.startswith("DPCCN"):
        from wesep_tpu.models.dpccn import DPCCN
        return DPCCN
    elif model_name.startswith("TFGridNet"):
        from wesep_tpu.models.tfgridnet import TFGridNet
        return TFGridNet
    elif model_name.startswith("CMGAN"):
        from wesep_tpu.models.discriminator import CMGANDiscriminator
        return CMGANDiscriminator
    else:  # model_name error !!!
        print("model name is " + model_name)
        raise NotImplementedError(model_name)
