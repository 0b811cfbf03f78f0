package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType

/** Per-file manifest-stats collection: ONE file open yields the footer
  * min/max/row stats AND the sum(n_tok) read straight off the n_tok
  * column pages through parquet-column readers.
  *
  * Why not a Spark job per commit: the previous statsFor ran
  * `spark.read.parquet(dir).groupBy(input_file_name()).agg(sum(n_tok))`
  * — a fixed ~0.3 s of job scheduling PER COMMIT, a pure serial floor
  * under many-commit ingest that caps N->4N scaling efficiency (the
  * job's latency is constant in core count). Reading the one required
  * int32 column through the page readers costs microseconds per
  * thousand rows, runs on a plain thread pool with zero scheduler
  * involvement, and shares the footer's already-open stream.
  *
  * Why not footer-only: parquet footers carry min/max/rows but no sums;
  * sum(n_tok) is the token-count bookkeeping every snapshot summary and
  * lineage record needs.
  *
  * For large file sets ([[TokenTable.statsFor]] dispatch) the SAME
  * per-file routine runs inside `mapPartitions` over the path list —
  * the work is embarrassingly parallel either way; only the scheduler
  * changes.
  */
object FileStats {

  /** Stats for one parquet file; None for a zero-row file (empty
    * partitions produce empty files that must not enter the manifest).
    * `rootUriPath` is the table location's URI path — file paths are
    * stored table-relative.
    */
  def statsForFile(fileUriPath: String, rootUriPath: String,
      conf: Configuration): Option[DataFile] = {
    val p = new org.apache.hadoop.fs.Path(fileUriPath)
    val inputFile = HadoopInputFile.fromPath(p, conf)
    val reader = ParquetFileReader.open(inputFile)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks
      var rows = 0L
      var minDoc: String = null; var maxDoc: String = null
      var minSrc: String = null; var maxSrc: String = null
      var minN = Int.MaxValue; var maxN = Int.MinValue
      def utf8(v: Any): String = v match {
        case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
        case x => String.valueOf(x)
      }
      // Cross-block merges MUST use UTF8 binary order: every consumer of
      // these bounds (ManifestFileIndex, Merge's segment index) compares
      // in UTF8String byte order, which diverges from Java String
      // (UTF-16 code-unit) order for supplementary-plane characters —
      // e.g. "￿" > "𐀀" in Java order but U+FFFF < U+10000
      // in byte order. A Java-order reduce over multi-row-group files
      // could record a non-bound ⇒ a pruning false-negative (missed file).
      val ord = graft.functions.Search.utf8Ordering
      blocks.forEach { b =>
        rows += b.getRowCount
        b.getColumns.forEach { c =>
          val st = c.getStatistics
          c.getPath.toDotString match {
            case "doc_id" if st != null && st.hasNonNullValue =>
              val lo = utf8(st.genericGetMin); val hi = utf8(st.genericGetMax)
              if (minDoc == null || ord.lt(lo, minDoc)) minDoc = lo
              if (maxDoc == null || ord.gt(hi, maxDoc)) maxDoc = hi
            case "source" if st != null && st.hasNonNullValue =>
              val lo = utf8(st.genericGetMin); val hi = utf8(st.genericGetMax)
              if (minSrc == null || ord.lt(lo, minSrc)) minSrc = lo
              if (maxSrc == null || ord.gt(hi, maxSrc)) maxSrc = hi
            case "n_tok" if st != null && st.hasNonNullValue =>
              val lo = st.genericGetMin.asInstanceOf[Number].intValue
              val hi = st.genericGetMax.asInstanceOf[Number].intValue
              if (lo < minN) minN = lo
              if (hi > maxN) maxN = hi
            case _ =>
          }
        }
      }
      if (rows == 0L) return None

      // sum(n_tok) off the column pages: project the reader down to the
      // one required int32 column so readNextRowGroup materializes only
      // its chunks, then drain each row group's ColumnReader.
      val fileMeta = footer.getFileMetaData
      val fullSchema = fileMeta.getSchema
      var sumNtok = 0L
      if (fullSchema.containsField("n_tok")) {
        val proj = new MessageType(fullSchema.getName,
          fullSchema.getType(fullSchema.getFieldIndex("n_tok")))
        reader.setRequestedSchema(proj)
        val desc = proj.getColumnDescription(Array("n_tok"))
        val conv = new GroupRecordConverter(proj).getRootConverter
        // Token-schema writes produce a REQUIRED column, but a caller
        // could stat files written from a nullable upstream schema:
        // guard on the definition level — reading getInteger at a null
        // position is undefined, not an error.
        val maxDef = desc.getMaxDefinitionLevel
        var store = reader.readNextRowGroup()
        while (store != null) {
          val cr = new ColumnReadStoreImpl(store, conv, proj, fileMeta.getCreatedBy)
            .getColumnReader(desc)
          var i = 0L
          val n = cr.getTotalValueCount
          while (i < n) {
            if (cr.getCurrentDefinitionLevel == maxDef) sumNtok += cr.getInteger
            cr.consume(); i += 1
          }
          store = reader.readNextRowGroup()
        }
      }

      Some(DataFile(
        path = p.toUri.getPath.stripPrefix(rootUriPath).stripPrefix("/"),
        bytes = inputFile.getLength,
        rows = rows,
        minDocId = minDoc, maxDocId = maxDoc,
        minNtok = minN, maxNtok = maxN,
        sumNtok = sumNtok,
        minSource = minSrc, maxSource = maxSrc,
        groups = blocks.size))
    } finally reader.close()
  }

  /** Recursive listing of the .parquet files under `absDir`, through
    * the Hadoop FileSystem of the directory's URI (works for any
    * configured filesystem, not just local disk). O(#files in ONE
    * commit's output dir) — bounded by the write's partition count, not
    * the table size.
    */
  def listParquet(absDir: String, conf: Configuration): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(absDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Nil
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += st.getPath.toUri.getPath
    }
    out.result()
  }
}
