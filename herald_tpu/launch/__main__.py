from herald_tpu.launch.cli import main

raise SystemExit(main())
