package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-files compaction: rewrite a parquet dataset into files of a target
  * size. At 100 TB, streaming sinks and fine-grained partitioned writes
  * accumulate small files that destroy scan parallelism economics (every
  * file costs a task + footer read); periodic compaction keeps file counts
  * proportional to data volume.
  *
  * Sizing uses the dataset's on-disk bytes (cheap: file listing, no scan) so
  * the shuffle-free `coalesce` path is chosen whenever we only merge files;
  * `repartition` (full shuffle) is reserved for growing the file count.
  */
object ParquetCompactor {

  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileMB: Int = 256): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(conf)
    val bytes = fs.getContentSummary(inPath).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt +
      (if (bytes % (targetFileMB.toLong << 20) > 0) 1 else 0))
    val df = spark.read.parquet(inDir)
    val current = df.rdd.getNumPartitions
    val sized = if (nFiles < current) df.coalesce(nFiles) else df.repartition(nFiles)
    sized.write.mode("overwrite").parquet(outDir)
    nFiles.toLong
  }
}
