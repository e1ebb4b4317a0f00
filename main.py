#!/usr/bin/env python
"""Entry point — same CLI surface as the reference's ``main.py``:

    python main.py --mode {preprocess,pretrain,classify,evaluate,ood,report,all}
                   [--classify-mode {linear_probe,finetune,both}]
                   [--config config.json] [--resume] [--set section.key=value]
"""
from tpuhar.cli import main

if __name__ == "__main__":
    main()
