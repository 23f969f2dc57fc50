from fpr_tpu.cli import main

main()
