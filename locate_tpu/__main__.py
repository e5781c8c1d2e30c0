from locate_tpu.cli import main

raise SystemExit(main())
