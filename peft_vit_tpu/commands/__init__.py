"""CLI drivers.

One parameterized driver replaces the reference's per-method scripts:

  python -m peft_vit_tpu.commands.run --method {lora,adapter,compacter,
      kadaptation,bitfit,layernorm,attention,rpb,lepe,transformer_probe,
      vpt,full,linear,...} --ds <dataset.yaml> --model <model.yaml>
  python -m peft_vit_tpu.commands.linear_probe --classifier {linear,logistic}
  python -m peft_vit_tpu.commands.zeroshot_eval
"""
