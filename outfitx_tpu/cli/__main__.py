from outfitx_tpu.cli.main import main

main()
