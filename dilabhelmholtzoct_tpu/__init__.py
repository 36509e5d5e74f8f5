"""dilabhelmholtzoct_tpu — TPU-native OCT-SAM segmentation framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of
philippendres/DILabHelmholtzOCT: MedSAM-style SAM fine-tuning on 14-class
retinal OCT segmentation, topological regularization, per-class evaluation,
and interactive prompt-to-mask inference — designed TPU-first.
"""

__version__ = "0.1.0"
