from tpinn.cli import main

main()
